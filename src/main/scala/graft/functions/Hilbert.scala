package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve layout keys: map a (x, y) cell in a 2^bits × 2^bits
  * grid to its position along the Hilbert space-filling curve.
  *
  * Why beside [[ZOrder]]: the Morton curve has "seams" — consecutive
  * key values can jump across the whole grid (…0111 → …1000 crosses a
  * quadrant boundary), so a parquet file holding a Morton key range can
  * span distant regions and its min/max column stats go wide. The
  * Hilbert curve moves ONE unit step per key increment (verified as a
  * property in HilbertSpec), so every contiguous key range is a
  * connected, compact blob — strictly tighter per-file min/max bounds
  * and more files pruned for the same predicate (measured head-to-head
  * by the `store_hilbert_skipping` gate). This is why Delta/Iceberg
  * offer Hilbert ordering as the premium layout at warehouse scale.
  *
  * The per-row transform is 8 rounds of branchy integer bit math —
  * hostile to a Column-expression spelling (the rotate/reflect
  * recurrence triples the expression tree per round), so it is a
  * native codegen'd expression instead, same as [[Md5Prefix]]: one
  * static call per row, zero allocations. The DuckDB oracle mirror
  * unrolls the same recurrence as a chain of CTEs (linear text, one
  * per round) over integer arithmetic only — both engines compute the
  * identical function bit-for-bit.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int = 8)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits per dimension must fit an int")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = Hilbert.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.xy2d($bits, $x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert {

  /** Distance along the Hilbert curve of the (x, y) cell. Inputs are
    * taken modulo 2^bits so any non-negative bucket value is safe.
    *
    * This is the MASKED formulation of the classic recurrence: the
    * textbook reflect step `x = s-1-x` can go negative (x still holds
    * bits ≥ s), and two's-complement bit extraction on negatives has
    * no faithful floor-division/modulo spelling in SQL. Since rounds
    * below level s only ever read bits < s, reducing x,y mod s before
    * reflecting is exactly equivalent (s-1-x ≡ s-1-(x mod s) mod s)
    * and keeps every intermediate in [0, s) — so the same integer
    * arithmetic runs verbatim in the DuckDB mirror. Equivalence to
    * the textbook form and the unit-step bijection are both proved
    * exhaustively in HilbertSpec.
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      // invariant: x, y ∈ [0, 2s)
      val rx = x / s
      val ry = y / s
      d += s * s * ((3 * rx) ^ ry)
      val lx = x % s
      val ly = y % s
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - ly; y = s - 1 - lx }
        else { x = ly; y = lx }
      } else { x = lx; y = ly }
      s >>= 1
    }
    d
  }

  /** Column-API form; inputs any non-negative integral columns. */
  def hilbertKey(x: Column, y: Column, bits: Int = 8): Column =
    column(HilbertKey(expression(x.cast("long")), expression(y.cast("long")),
      bits))

  /** DuckDB mirror: the round recurrence as a chain of CTEs. Returns
    * (cteChain, finalRelation) where `cteChain` is the comma-joined
    * CTE bodies to splice after a leading WITH (the caller supplies
    * the base relation `from` exposing columns `hx`, `hy` already
    * reduced mod 2^bits, plus any passthrough columns in `keep`), and
    * `finalRelation` exposes `keep` plus `hd` (the Hilbert key).
    *
    * Reflection/swap per round is pure integer CASE arithmetic —
    * `(3*rx) XOR ry` is spelled `CASE WHEN rx=1 THEN 3-ry ELSE ry END`
    * to avoid any engine-specific xor spelling.
    */
  def hilbertCtes(from: String, keep: Seq[String], bits: Int = 8,
      prefix: String = "hb"): (String, String) = {
    val ks = if (keep.isEmpty) "" else keep.mkString("", ", ", ", ")
    val base =
      s"${prefix}0 AS (SELECT ${ks}hx, hy, CAST(0 AS BIGINT) AS hd FROM $from)"
    val rounds = (1 to bits).map { i =>
      val s = 1L << (bits - i)
      // inner subquery renames every input (rx/ry/lx/ly/pd) so no
      // SELECT item ever references a name it also defines — immune
      // to lateral-column-alias resolution in either engine
      s"""$prefix$i AS (SELECT $ks
         |    CASE WHEN ry = 0
         |      THEN (CASE WHEN rx = 1 THEN ${s - 1} - ly ELSE ly END)
         |      ELSE lx END AS hx,
         |    CASE WHEN ry = 0
         |      THEN (CASE WHEN rx = 1 THEN ${s - 1} - lx ELSE lx END)
         |      ELSE ly END AS hy,
         |    pd + $s * $s * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END)
         |      AS hd
         |  FROM (SELECT ${ks}hx // $s AS rx, hy // $s AS ry,
         |      hx % $s AS lx, hy % $s AS ly, hd AS pd
         |    FROM $prefix${i - 1}) ${prefix}q$i)""".stripMargin
    }
    ((base +: rounds).mkString(",\n"), s"$prefix$bits")
  }
}
