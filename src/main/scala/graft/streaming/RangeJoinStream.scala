package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming point-in-interval join: the stream-stream twin of the
  * batch `j_range_clicks_after_purchase` gate
  * ([[graft.functions.RangeJoin]]) — purchases and clicks BOTH arrive
  * as streams, and a click matches a purchase of the same user when
  * it falls in the half-open window [purchase, purchase + windowUs).
  *
  * This is the one Structured Streaming join regime the other
  * streaming modules don't exercise: a genuine STREAM-STREAM inner
  * join. Spark buffers both sides in the state store; the two
  * watermarks plus the time-range predicate bound how long — a
  * purchase can stop waiting for clicks once the click watermark
  * passes its window end, and a click can stop waiting for purchases
  * once the purchase watermark passes its own timestamp, so state is
  * evicted continuously instead of growing with the stream
  * (the watermark-derived state-cleanup contract of stream-stream
  * joins). At 100 TB/day the state held at any instant is one
  * window's worth of events per key, not the history.
  *
  * The join condition carries the range on the EVENT-TIME columns
  * (`cts >= pts AND cts < pts + window`) — the shape Spark's
  * analyzer recognizes to derive those per-side state watermarks; a
  * condition only on derived epoch columns would buffer both sides
  * forever.
  */
object RangeJoinStream {

  /** A purchase arrival (epoch micros). */
  final case class PurchaseEvent(event_id: Long, user_id: Long, p_us: Long)

  /** A click arrival (epoch micros); the user column is named apart so
    * the joined frame needs no aliases. */
  final case class ClickEvent(click_user: Long, c_us: Long)

  /** Matched (purchase, click) pairs within the window, as epoch
    * micros — row-equal to the batch
    * [[graft.functions.RangeJoin.pointInInterval]] on the same rows
    * (each true pair emitted exactly once, in whichever micro-batch
    * completes it).
    *
    * @param windowSec window length in whole seconds (half-open)
    * @param lateness  max out-of-order delay both watermarks tolerate
    */
  def matchedPairs(spark: SparkSession,
      purchases: Dataset[PurchaseEvent], clicks: Dataset[ClickEvent],
      windowSec: Long, lateness: String): DataFrame =
    joined(purchases, clicks, windowSec, lateness, "inner")

  /** LEFT-OUTER variant: every purchase row emits — matched pairs as
    * they meet, and an unmatched purchase as (event_id, user_id,
    * p_us, NULL c_us) once BOTH watermarks prove its window can no
    * longer be joined (outer results are withheld until the state
    * store can discard the row, so null emission is exactly-once by
    * construction). The streaming twin of the batch gate's LEFT join
    * + zero-count semantics.
    */
  def matchedPairsOuter(spark: SparkSession,
      purchases: Dataset[PurchaseEvent], clicks: Dataset[ClickEvent],
      windowSec: Long, lateness: String): DataFrame =
    joined(purchases, clicks, windowSec, lateness, "left_outer")

  private def joined(purchases: Dataset[PurchaseEvent],
      clicks: Dataset[ClickEvent], windowSec: Long, lateness: String,
      joinType: String): DataFrame = {
    val p = purchases.toDF()
      .withColumn("pts", timestamp_micros(col("p_us")))
      .withWatermark("pts", lateness)
    val c = clicks.toDF()
      .withColumn("cts", timestamp_micros(col("c_us")))
      .withWatermark("cts", lateness)
    p.join(c,
        col("user_id") === col("click_user") &&
          col("cts") >= col("pts") &&
          col("cts") < col("pts") + expr(s"INTERVAL $windowSec SECOND"),
        joinType)
      .select(col("event_id"), col("user_id"), col("p_us"), col("c_us"))
  }
}
