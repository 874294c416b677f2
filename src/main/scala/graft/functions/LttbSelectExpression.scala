package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** LTTB downsampling selection (largest-triangle-three-buckets,
  * Steinarsson 2013) over ONE series, as a scalar Catalyst expression
  * — the [[MmrSelect]] pattern applied to the dashboard downsampler.
  *
  * Input: `array<struct<x: bigint, y: bigint>>`, the series' points
  * sorted ascending by x (x unique within a series — the day grain
  * guarantees it, and makes array position equal the old
  * ROW_NUMBER()-1 index). Output: `array<struct<sel: bigint,
  * x: bigint, y: bigint>>` — the first point (sel 0), the `nb` middle
  * picks (sel 1..nb), and the last point (sel nb+1).
  *
  * Why an expression and not a plan (r17): selection is inherently
  * sequential — bucket k's pick is a vertex of bucket k+1's triangles
  * — so the pre-r17 spelling unrolled 8 chained join+argmax rounds,
  * each behind an eager `Materialize.stable` localCheckpoint to stop
  * the O(buckets²) plan blow-up: ~10 jobs, 8 materializations, and 21
  * Exchange nodes per run for what is per-series O(np) arithmetic.
  * Collapsing the ladder into one eval makes the operator a per-row
  * map over the grouped series table (embarrassingly parallel in the
  * SERIES dimension, which is the scale dimension). Per-series state
  * is the (days × 16 bytes) point array — the same bounded-series
  * contract the old broadcast(np) join already assumed.
  *
  * Cross-engine exactness (unchanged discipline): the triangle area
  * stays the integer cross-product |（m·xa − Σx)(yb − ya) −
  * (xa − xb)(Σy − m·ya)|, ties to the smallest x; bucket edges use
  * truncating integer division exactly like the old `div`
  * expressions; all arithmetic is `Math.*Exact`, mirroring the ANSI
  * overflow-throw semantics of the SQL expressions it replaces.
  *
  * Degenerate-series parity (np < nb + 2, impossible at the gate's
  * ≥ 10-point contract but kept bit-compatible anyway): the first
  * empty bucket ends the ladder — later sel rows are NOT emitted,
  * exactly as the old empty-join rounds dropped them — while sel 0
  * and the last point still emit (they were independent branches).
  */
case class LttbSelect(child: Expression, nb: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sel", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Long](n)
    val ys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      xs(i) = row.getLong(0)
      ys(i) = row.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def emit(sel: Long, x: Long, y: Long): Unit =
      out += new GenericInternalRow(Array[Any](sel, x, y))
    if (n > 0) {
      emit(0L, xs(0), ys(0))
      // bucket edge for boundary b (0..nb): 1 + (b * (n - 2)) div nb,
      // truncating division — identical to the old SQL `div`
      def edge(b: Int): Long = 1L + (b.toLong * (n - 2L)) / nb
      var xa = xs(0)
      var ya = ys(0)
      var k = 0
      var alive = true
      while (k < nb && alive) {
        // next-bucket mass (m, Σx, Σy); the last round uses the final
        // point itself with m = 1
        var m = 0L; var sx = 0L; var sy = 0L
        if (k < nb - 1) {
          val lo = edge(k + 1); val hi = edge(k + 2)
          var j = lo
          while (j < hi && j < n) {
            m += 1L
            sx = Math.addExact(sx, xs(j.toInt))
            sy = Math.addExact(sy, ys(j.toInt))
            j += 1
          }
          if (m == 0L) alive = false
        } else { m = 1L; sx = xs(n - 1); sy = ys(n - 1) }
        if (alive) {
          val clo = edge(k); val chi = edge(k + 1)
          var best = -1
          var bestArea = 0L
          var c = clo
          while (c < chi && c < n) {
            val ci = c.toInt
            // |（m·xa − Σx)(y − ya) − (xa − x)(Σy − m·ya)|, exact longs
            val area = Math.absExact(Math.subtractExact(
              Math.multiplyExact(
                Math.subtractExact(Math.multiplyExact(m, xa), sx),
                Math.subtractExact(ys(ci), ya)),
              Math.multiplyExact(
                Math.subtractExact(xa, xs(ci)),
                Math.subtractExact(sy, Math.multiplyExact(m, ya)))))
            if (best < 0 || area > bestArea ||
                (area == bestArea && xs(ci) < xs(best))) {
              best = ci; bestArea = area
            }
            c += 1L
          }
          if (best < 0) alive = false
          else {
            emit((k + 1).toLong, xs(best), ys(best))
            xa = xs(best); ya = ys(best)
          }
        }
        k += 1
      }
      emit((nb + 1).toLong, xs(n - 1), ys(n - 1))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LttbSelect {
  /** Column-API form: `pts` is an array of (x, y) structs sorted
    * ascending by x. */
  def lttb_select(pts: Column, nb: Int): Column =
    column(LttbSelect(expression(pts), nb))
}
