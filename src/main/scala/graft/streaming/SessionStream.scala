package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization: the session_window + watermark
  * counterpart of the batch `sessionize_events` gate
  * (graft.operators.TimeSeriesOps — lag/cumsum formulation over
  * (user_id, ts)). Both split a user's event stream wherever
  * consecutive events are more than `gap` apart; Structured
  * Streaming's session window maintains exactly that state per key
  * and merges micro-batch arrivals into open sessions until the
  * watermark passes a session's close.
  *
  * Scale design: state is keyed by user_id — uniform, shuffle-on-key,
  * bounded per user by the open-session count (1). Append mode emits
  * each session exactly once when it can no longer grow, so the sink
  * sees final rows only — the same contract as the batch aggregate.
  */
object SessionStream {

  /** Per-session aggregate over a (possibly streaming) event frame
    * with columns (user_id, event_type, ts: timestamp).
    * Output: user_id, start_us/end_us (min/max event micros),
    * n_events, n_purchase — the batch gate's columns minus the
    * per-user ordinal (an artifact of the batch windowing, recoverable
    * by sorting start_us per user).
    */
  def sessions(events: DataFrame, gap: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("long").as("n_purchase"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("n_purchase"))
}
