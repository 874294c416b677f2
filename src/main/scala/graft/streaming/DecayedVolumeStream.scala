package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.TimeSeriesOps

/** Streaming twin of the `ts_decayed_volume` gate: the
  * recency-weighted volume maintained INCREMENTALLY — the
  * trending-now leaderboard a deployment actually serves, updated as
  * each day closes instead of rescanned from history.
  *
  * The batch gate's decay is the fixed 30-entry micro-quantized
  * weight table (age 0–29; older days weigh 0), so the exact
  * incremental state is a bounded RING of the last 30 closed
  * (day, total) pairs per series — not the naive `state × 0.9 + x`
  * scalar (that form is the infinite-horizon decay; the table
  * truncates at 30 days, and quantized weights don't compose
  * multiplicatively). On each closed day: evict entries older than
  * 29 days behind the new frontier, append, and fold the ring
  * against the SAME literal table ([[TimeSeriesOps.decayWeights]] —
  * single source of truth with the gate and its DuckDB oracle), so
  * every emitted column is the exact integer the batch gate computes
  * at that frontier.
  *
  * Scale design: state is ≤ 30 pairs of longs per series —
  * series-count-bounded, uniform keys. Buckets must arrive per-series
  * in non-decreasing epoch order across micro-batches (the
  * watermark-closed output of AnomalyStream.dailyCounts satisfies
  * this); within a batch the group iterator is sorted, and a bucket
  * at or before the last consumed epoch is a late duplicate of a
  * closed day and is dropped.
  *
  * Frontier semantics: each emission is the gate's answer AS OF that
  * series' own newest closed day. The batch gate anchors every series
  * to the GLOBAL max day; the two agree for every series with data on
  * the global frontier day (the spec pins this parity on real event
  * data).
  */
object DecayedVolumeStream {

  /** One closed daily bucket: epoch = days since 1970-01-01. */
  final case class Bucket(series: String, epoch: Long, x: Long)

  /** Decayed totals as of `epoch` — the batch gate's columns. */
  final case class DecayPoint(series: String, epoch: Long,
      n_days: Long, raw_total: Long, decayed9_micro: Long,
      decayed8_micro: Long, decayed9: Long, freshness_ppm: Long)

  /** Keyed state: the 30-day ring (parallel day/total arrays, public
    * for the state encoder's generated code). */
  final case class St(lastEpoch: Long, days: Seq[Long], xs: Seq[Long])

  private val w9: Map[Long, Long] =
    TimeSeriesOps.decayWeights.map(t => t._1.toLong -> t._2).toMap
  private val w8: Map[Long, Long] =
    TimeSeriesOps.decayWeights.map(t => t._1.toLong -> t._3).toMap

  /** Fold one ring (already evicted to ages 0–29 of `frontier`) into
    * the gate's exact columns. */
  private def fold(series: String, frontier: Long,
      days: Seq[Long], xs: Seq[Long]): DecayPoint = {
    var n = 0L; var raw = 0L; var d9 = 0L; var d8 = 0L
    var i = 0
    while (i < days.length) {
      val age = frontier - days(i)
      n += 1; raw += xs(i)
      d9 += xs(i) * w9(age); d8 += xs(i) * w8(age)
      i += 1
    }
    // mirror the gate's truncating divisions (all quantities
    // non-negative, so `div`/`//`/Java `/` agree). freshness is
    // d9/raw — identical floor value to the gate's spelled
    // d9·10⁶ // (raw·10⁶) but without the d9·10⁶ Long wrap once a
    // series' 30-day decayed volume exceeds ~9.2e12. raw = 0 (a
    // stream of zero-count closed days) would divide by zero where
    // the batch gate's SQL emits NULL; DecayPoint is flat longs, so
    // emit the −1 sentinel (unreachable for any ppm, which is ≥ 0).
    DecayPoint(series, frontier, n, raw, d9, d8, d9 / 1000000L,
      if (raw == 0L) -1L else d9 / raw)
  }

  private def update(series: String, it: Iterator[Bucket],
      state: GroupState[St]): Iterator[DecayPoint] = {
    var st = state.getOption.getOrElse(St(Long.MinValue, Nil, Nil))
    val out = scala.collection.mutable.ArrayBuffer.empty[DecayPoint]
    it.toSeq.sortBy(_.epoch).foreach { b =>
      if (b.epoch > st.lastEpoch) {
        val keep = st.days.indices
          .filter(i => b.epoch - st.days(i) <= 29L)
        val days = keep.map(st.days) :+ b.epoch
        val xs = keep.map(st.xs) :+ b.x
        st = St(b.epoch, days, xs)
        out += fold(series, b.epoch, days, xs)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Decayed-volume points over a (possibly streaming) bucket frame;
    * one output row per consumed bucket, Append-compatible.
    */
  def monitor(spark: SparkSession, buckets: Dataset[Bucket])
      : Dataset[DecayPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    buckets
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch reference: the same ring fold as a sequential pass — what
    * [[monitor]] must reproduce for any micro-batching. */
  def reference(buckets: Seq[Bucket]): Seq[DecayPoint] =
    buckets.groupBy(_.series).toSeq.flatMap { case (series, bs) =>
      var ring = Vector.empty[(Long, Long)]
      var last = Long.MinValue
      bs.sortBy(_.epoch).flatMap { b =>
        if (b.epoch <= last) None
        else {
          last = b.epoch
          ring = ring.filter(p => b.epoch - p._1 <= 29L) :+
            ((b.epoch, b.x))
          Some(fold(series, b.epoch, ring.map(_._1), ring.map(_._2)))
        }
      }
    }
}
