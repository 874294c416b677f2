package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval-overlap join.
  *
  * The naive form of "rows whose [start, end] intervals intersect" is
  * an inequality theta-join — Spark can only execute it as a
  * broadcast-nested-loop or cartesian product, both quadratic. Here
  * BOTH sides explode into the fixed-width time buckets their interval
  * covers, the join runs as a hash EQUI-join on the bucket key with
  * the overlap predicate as a residual filter, and each matching pair
  * is kept only in its OWNING bucket — the first bucket both intervals
  * occupy, `greatest(lStart, rStart) div bucketWidth` (two overlapping
  * intervals always share that bucket, so exactly one copy survives).
  *
  * Owning-bucket emission (rather than a trailing distinct) preserves
  * BAG semantics: exact-duplicate input rows yield the same pair
  * multiplicity the naive theta-join would — a distinct would collapse
  * genuine input duplicates along with the cross-bucket copies. It is
  * also one shuffle cheaper at scale: no global dedup pass over the
  * joined output.
  *
  * Scale shape: bucket fan-out is bounded by interval-length /
  * bucket-width (pick the bucket near the median interval length), so
  * the explode is O(rows · small-constant); the equi-join shuffles on
  * the bucket key — time-uniform workloads give uniform buckets, and a
  * hot bucket is split further by AQE skew-join handling. Nothing is
  * quadratic in either input.
  */
object IntervalJoin {

  /** Join rows of `left` and `right` whose closed intervals
    * [`lStart`,`lEnd`] and [`rStart`,`rEnd`] intersect (touching
    * endpoints count). Column names must not collide across the two
    * inputs. Bounds must be non-negative integers (epoch micros).
    * Row multiplicity matches the naive theta-join (duplicate input
    * rows produce duplicate pairs).
    */
  def overlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket", explode(expr(
      s"sequence($lStart div ${bucketWidth}L, $lEnd div ${bucketWidth}L)")))
    val rb = right.withColumn("__bucket", explode(expr(
      s"sequence($rStart div ${bucketWidth}L, $rEnd div ${bucketWidth}L)")))
    lb.join(rb, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") ===
        expr(s"greatest($lStart, $rStart) div ${bucketWidth}L"))
      .drop("__bucket")
  }
}
