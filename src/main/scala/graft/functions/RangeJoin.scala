package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * A naive `p.t BETWEEN i.start AND i.end` join gives Catalyst no
  * equi-key: it plans a per-key nested loop (or worse, a broadcast
  * nested loop) that goes quadratic on co-keyed rows. The standard
  * scale shape is BUCKETING: time is cut into fixed buckets, each
  * interval is replicated to every bucket it covers (bounded by
  * span / bucketWidth + 1 copies), each point belongs to exactly ONE
  * bucket, and the join becomes a plain hash equi-join on
  * (key, bucket) with the precise range predicate as a post-filter.
  * Every true pair meets in exactly one bucket, so the result needs
  * no dedup. Pick `bucketUs` near the typical interval length: one
  * replica per interval, and bucket keys stay uniform.
  */
object RangeJoin {

  /** Inner-join matched (interval, point) pairs. Times are LONG epoch
    * micros. Output columns are the interval's prefixed `i_` and the
    * point's prefixed `p_`. Intervals are half-open [start, end).
    */
  def pointInInterval(
      intervals: DataFrame, iKey: String, iStartUs: String, iEndUs: String,
      points: DataFrame, pKey: String, pTimeUs: String,
      bucketUs: Long): DataFrame = {
    val iv = intervals.columns
      .foldLeft(intervals)((d, c) => d.withColumnRenamed(c, s"i_$c"))
      .withColumn("__k", col(s"i_$iKey"))
      .withColumn("__b", explode(expr(
        s"sequence(i_$iStartUs div ${bucketUs}L, (i_$iEndUs - 1) div ${bucketUs}L)")))
    val pt = points.columns
      .foldLeft(points)((d, c) => d.withColumnRenamed(c, s"p_$c"))
      .withColumn("__k", col(s"p_$pKey"))
      .withColumn("__b", expr(s"p_$pTimeUs div ${bucketUs}L"))
    iv.join(pt, Seq("__k", "__b"))
      .filter(col(s"p_$pTimeUs") >= col(s"i_$iStartUs") &&
        col(s"p_$pTimeUs") < col(s"i_$iEndUs"))
      .drop("__k", "__b")
  }
}
