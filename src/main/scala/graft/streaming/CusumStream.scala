package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CUSUM changepoint monitor: Page's procedure in its TRUE
  * online form — reference mean μ, slack κ and alarm threshold h are
  * DESIGN PARAMETERS fixed up front (per monitored series), and the
  * two one-sided sums update in O(1) state per arriving bucket:
  *
  *   s⁺ ← max(0, s⁺ + (x − μ) − κ),  s⁻ ← max(0, s⁻ − (x − μ) − κ),
  *   alarm when either exceeds h.
  *
  * This deliberately differs from the batch `ts_cusum` gate, which
  * ESTIMATES μ from the whole series (dev = n·x − Σx): the estimated
  * form needs the complete series and therefore streams like
  * [[AnomalyStream]] (stream the daily counts; run the flags as a
  * batch query over the growing table), while this object is the
  * monitor a pipeline deploys once μ has been calibrated — the
  * recursion every textbook states, consuming each bucket exactly
  * once.
  *
  * Scale design: state is three longs per monitored series (s⁺, s⁻,
  * last bucket) — series-count–bounded, uniform keys, shuffle-on-key.
  * Buckets must arrive per-series in non-decreasing order (the
  * watermark-closed output of [[AnomalyStream.dailyCounts]] in append
  * mode satisfies this across micro-batches; within a micro-batch the
  * group iterator is sorted here). A bucket at or before the
  * last-seen epoch is a late duplicate of a closed bucket and is
  * dropped, mirroring exactly-once bucket consumption.
  */
object CusumStream {

  /** One closed bucket of a monitored series. `epoch` is any
    * monotonic bucket index (epoch-day for daily counts). */
  final case class Bucket(series: String, epoch: Long, x: Long)

  /** CUSUM state/output after consuming a bucket. */
  final case class CusumPoint(series: String, epoch: Long, x: Long,
      s_pos: Long, s_neg: Long, alarm: Boolean)

  /** Keyed state: last consumed bucket epoch + the two one-sided sums
    * (public — the state encoder's generated code constructs it). */
  final case class St(lastEpoch: Long, sPos: Long, sNeg: Long)

  /** Fixed design parameters per monitored series: target mean, slack
    * per bucket, alarm threshold. */
  final case class Params(mu: Long, kappa: Long, h: Long)

  private def update(params: Map[String, Params], default: Params)(
      series: String, it: Iterator[Bucket],
      state: GroupState[St]): Iterator[CusumPoint] = {
    val p = params.getOrElse(series, default)
    var st = state.getOption.getOrElse(St(Long.MinValue, 0L, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[CusumPoint]
    it.toSeq.sortBy(_.epoch).foreach { b =>
      if (b.epoch > st.lastEpoch) {
        val dev = b.x - p.mu
        val sPos = math.max(0L, st.sPos + dev - p.kappa)
        val sNeg = math.max(0L, st.sNeg - dev - p.kappa)
        st = St(b.epoch, sPos, sNeg)
        out += CusumPoint(series, b.epoch, b.x, sPos, sNeg,
          sPos > p.h || sNeg > p.h)
      }
    }
    state.update(st)
    out.iterator
  }

  /** CUSUM points over a (possibly streaming) bucket frame. One output
    * row per consumed bucket; Append-compatible via
    * flatMapGroupsWithState.
    */
  def monitor(spark: SparkSession, buckets: Dataset[Bucket],
      params: Map[String, Params], default: Params)
      : Dataset[CusumPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    buckets
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(params, default))
  }

  /** Batch reference: the same recursion as a sequential fold —
    * what [[monitor]] must reproduce for any micro-batching. */
  def reference(buckets: Seq[Bucket], params: Map[String, Params],
      default: Params): Seq[CusumPoint] =
    buckets.groupBy(_.series).toSeq.flatMap { case (series, bs) =>
      val p = params.getOrElse(series, default)
      var (sPos, sNeg) = (0L, 0L)
      var last = Long.MinValue
      bs.sortBy(_.epoch).flatMap { b =>
        if (b.epoch <= last) None
        else {
          val dev = b.x - p.mu
          sPos = math.max(0L, sPos + dev - p.kappa)
          sNeg = math.max(0L, sNeg - dev - p.kappa)
          last = b.epoch
          Some(CusumPoint(series, b.epoch, b.x, sPos, sNeg,
            sPos > p.h || sNeg > p.h))
        }
      }
    }
}
