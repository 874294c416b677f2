package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming anomaly detection: the stream side of the
  * ts_anomaly_zscore gate, split the way a production pipeline splits
  * it —
  *
  *   1. a watermarked tumbling-day count aggregation maintains the
  *      per-(series, day) event counts incrementally (this object);
  *      append mode emits each day exactly once when the watermark
  *      closes it, so the sink table only ever holds final counts;
  *   2. the integer z-score flags are a BATCH query over that
  *      continuously-growing daily table —
  *      [[graft.operators.TimeSeriesOps.anomalyFlags]], the same
  *      physical query the batch gate runs, so stream + flags ≡ batch
  *      by construction (equivalence-tested in AnomalyStreamSpec).
  *
  * Scale design: streaming state is keyed by (event_type, day) —
  * bounded by series-count × watermark horizon, uniform keys; the
  * flags query reads days × series rows, trivially small at any event
  * volume.
  */
object AnomalyStream {

  /** Watermarked daily event counts over a streaming (or batch) frame
    * with columns (event_type, ts: timestamp). Append-mode compatible:
    * one final row per (event_type, day).
    */
  def dailyCounts(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), to_date(col("window.start")).as("day"),
        col("n_events"))
}
