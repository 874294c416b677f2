package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Page–Hinkley drift monitor: the change-of-mean detector
  * in its TRUE online form. Unlike CUSUM (fixed reference mean μ), PH
  * tracks the RUNNING mean, so the state carries the count and sum:
  *
  *   n ← n+1;  S ← S+x;  dev = x·10⁶ − (S·10⁶ div n)
  *   M ← M + dev;  minM ← min(minM, M);  alarm when M − minM > λ
  *
  * — exactly the batch `ts_page_hinkley` gate's per-row recursion (the
  * prefix-sum // row-number truncation is reproduced bit-for-bit), so
  * the stream over the raw variant equals the batch gate's columns.
  * λ is a DESIGN PARAMETER here (the calibrated deployment form, like
  * [[CusumStream]]'s h); the batch gate derives its λ from the full
  * series because it can see it.
  *
  * Scale design: state is five longs per monitored series — series-
  * count-bounded, uniform keys. Buckets must arrive per-series in
  * non-decreasing epoch order across micro-batches (the watermark-
  * closed output of AnomalyStream.dailyCounts satisfies this); within
  * a batch the group iterator is sorted, and a bucket at or before
  * the last consumed epoch is a late duplicate of a closed bucket and
  * is dropped.
  */
object PageHinkleyStream {

  /** One closed bucket of a monitored series. */
  final case class Bucket(series: String, epoch: Long, x: Long)

  /** PH state/output after consuming a bucket. All ppm columns are in
    * the batch gate's micro units. */
  final case class PhPoint(series: String, epoch: Long, x: Long,
      mt_ppm: Long, ph_ppm: Long, alarm: Boolean)

  /** Keyed state (public — the state encoder's generated code
    * constructs it). */
  final case class St(lastEpoch: Long, n: Long, sumX: Long,
      m: Long, minM: Long)

  private def update(lambdaPpm: Map[String, Long], default: Long)(
      series: String, it: Iterator[Bucket],
      state: GroupState[St]): Iterator[PhPoint] = {
    val lam = lambdaPpm.getOrElse(series, default)
    var st = state.getOption
      .getOrElse(St(Long.MinValue, 0L, 0L, 0L, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[PhPoint]
    it.toSeq.sortBy(_.epoch).foreach { b =>
      if (b.epoch > st.lastEpoch) {
        val n = st.n + 1
        val sumX = st.sumX + b.x
        val dev = b.x * 1000000L - (sumX * 1000000L) / n
        val m = st.m + dev
        val minM = math.min(st.minM, m)
        st = St(b.epoch, n, sumX, m, minM)
        out += PhPoint(series, b.epoch, b.x, m, m - minM,
          m - minM > lam)
      }
    }
    state.update(st)
    out.iterator
  }

  /** PH points over a (possibly streaming) bucket frame; one output
    * row per consumed bucket, Append-compatible.
    */
  def monitor(spark: SparkSession, buckets: Dataset[Bucket],
      lambdaPpm: Map[String, Long], default: Long)
      : Dataset[PhPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    buckets
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(lambdaPpm, default))
  }

  /** Batch reference: the same recursion as a sequential fold — what
    * [[monitor]] must reproduce for any micro-batching. */
  def reference(buckets: Seq[Bucket], lambdaPpm: Map[String, Long],
      default: Long): Seq[PhPoint] =
    buckets.groupBy(_.series).toSeq.flatMap { case (series, bs) =>
      val lam = lambdaPpm.getOrElse(series, default)
      var (n, sumX, m, minM) = (0L, 0L, 0L, 0L)
      var last = Long.MinValue
      bs.sortBy(_.epoch).flatMap { b =>
        if (b.epoch <= last) None
        else {
          n += 1; sumX += b.x
          val dev = b.x * 1000000L - (sumX * 1000000L) / n
          m += dev
          minM = math.min(minM, m)
          last = b.epoch
          Some(PhPoint(series, b.epoch, b.x, m, m - minM,
            m - minM > lam))
        }
      }
    }
}
