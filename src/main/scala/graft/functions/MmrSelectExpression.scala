package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998)
  * over one query's candidate pool, as a scalar Catalyst expression.
  *
  * Input: `array<struct<vid: bigint, rel: double, qv: array<bigint>,
  * norm2: bigint>>` — the query's top-N retrieval candidates with
  * their relevance (query cosine) and quantized vectors. Output:
  * `array<struct<vid: bigint, mmr_rank: int, score: double>>` — the k
  * greedy MMR picks, where pick i maximizes
  * `lam·rel(d) − mu·max_{s∈selected} cos(d, s)` (ties to the smaller
  * vid; the max-sim term is 0 for the first pick).
  *
  * Why an expression and not a plan: MMR is a per-QUERY sequential
  * loop over a BOUNDED pool (N ≤ tens) — there is no distribution
  * inside one query's selection, only across queries. Collapsing the
  * k×N×k inner loops into one eval keeps the operator a per-row map
  * over the grouped candidate table (embarrassingly parallel in the
  * query dimension, which is the scale dimension), instead of k
  * unrolled join+window rounds shuffling the candidate table five
  * times. CodegenFallback is deliberate: the expression runs once per
  * QUERY (not per candidate pair), so it is never the hot path —
  * candidate scoring upstream stays codegen'd.
  *
  * Cross-engine determinism: `lam`/`mu` are passed as independent
  * literals (never derived as `1 − lam`, whose double value differs
  * from the 0.3 literal an oracle writes); pairwise cosine is
  * exact-long dot ÷ (sqrt·sqrt) — every step correctly-rounded IEEE
  * on identical operands, so scores and therefore picks are
  * bit-identical to a SQL spelling of the same greedy.
  */
case class MmrSelect(child: Expression, k: Int, lam: Double, mu: Double)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vid", LongType, nullable = false),
    StructField("mmr_rank", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val vids = new Array[Long](n)
    val rels = new Array[Double](n)
    val qvs = new Array[Array[Long]](n)
    val sq = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 4)
      vids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      qvs(i) = row.getArray(2).toLongArray()
      sq(i) = math.sqrt(row.getLong(3).toDouble)
      i += 1
    }
    val kk = math.min(k, n)
    val used = new Array[Boolean](n)
    val picks = new Array[Int](kk)
    val scores = new Array[Double](kk)
    var r = 0
    while (r < kk) {
      var best = -1
      var bestScore = 0.0
      var c = 0
      while (c < n) {
        if (!used(c)) {
          // true MAX over the selected set (can be negative — must
          // match a SQL MAX aggregate, not clamp at zero); 0.0 only
          // for the first pick, where the term is absent
          var ms = if (r == 0) 0.0 else Double.NegativeInfinity
          var s = 0
          while (s < r) {
            val p = picks(s)
            var dot = 0L
            val qa = qvs(c); val qb = qvs(p)
            val len = math.min(qa.length, qb.length)
            var d = 0
            while (d < len) { dot += qa(d) * qb(d); d += 1 }
            val cos = dot.toDouble / (sq(c) * sq(p))
            if (cos > ms) ms = cos
            s += 1
          }
          val sc = lam * rels(c) - mu * ms
          if (best < 0 || sc > bestScore ||
              (sc == bestScore && vids(c) < vids(best))) {
            best = c; bestScore = sc
          }
        }
        c += 1
      }
      picks(r) = best; scores(r) = bestScore; used(best) = true
      r += 1
    }
    val out = new Array[Any](kk)
    r = 0
    while (r < kk) {
      out(r) = new GenericInternalRow(
        Array[Any](vids(picks(r)), r + 1, scores(r)))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MmrSelect {
  /** Column-API form: candidates is an array of (vid, rel, qv, norm2)
    * structs in that field order. */
  def mmr_select(candidates: Column, k: Int, lam: Double,
      mu: Double): Column =
    column(MmrSelect(expression(candidates), k, lam, mu))
}
