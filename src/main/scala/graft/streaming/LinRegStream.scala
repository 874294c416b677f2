package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TimeSeriesOps

/** Streaming twin of the ts_linreg_trend gate: online least squares
  * as a plain keyed streaming aggregation of the five sufficient
  * statistics (n, Σx, Σx², Σy, Σxy, Σy²).
  *
  * This is the textbook online-OLS decomposition — the model never
  * needs the points, only the running moments — and it maps onto
  * Structured Streaming with NO custom state: each statistic is an
  * associative aggregate Spark's state store accumulates per series
  * across micro-batches (O(1) state per series). The value sums are
  * decimal-exact (the widedsum discipline), so accumulation order
  * cannot perturb them and the streamed statistics equal the batch
  * fold bit-for-bit; the closed form is then a per-row map over the
  * stats table ([[TimeSeriesOps.linregClosedForm]]), run at read time
  * like every derived view of a streaming sink.
  *
  * LinRegStreamSpec proves stream ≡ batch across a micro-batch split.
  */
object LinRegStream {

  /** Streaming sufficient-statistics aggregation. `events` is a
    * streaming frame with (event_type, ts, value); run in `complete`
    * (or `update`) output mode — the aggregation is unbounded-window,
    * no watermark.
    */
  def stats(events: DataFrame): DataFrame =
    TimeSeriesOps.linregStats(TimeSeriesOps.linregPoints(events))
}
