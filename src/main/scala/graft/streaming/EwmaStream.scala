package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the `ts_ewma` gate: the integer EWMA smoother in
  * its TRUE online form — the batch gate's per-series recursion
  * (ewma(1) = x(1); ewma(t) = (ewma(t−1) + x(t)) div 2, the exact
  * α = 1/2 integer smoother) carried as TWO LONGS of keyed state per
  * series, so the live smoothed line a dashboard draws is
  * bit-identical to the batch gate's column at every closed day.
  *
  * This is the smallest state of any monitor in the family
  * (PageHinkley carries five longs, the rings carry 30–60) — the
  * demonstration that the exact-integer discipline collapses the
  * classic float-EWMA deployment problem (replay divergence) to a
  * trivially replayable fold.
  *
  * Ordering contract is the family's: per-series non-decreasing epoch
  * across micro-batches, intra-batch sorted, late duplicates of
  * closed days dropped.
  */
object EwmaStream {

  /** One closed daily bucket of a monitored series. */
  final case class Bucket(series: String, epoch: Long, x: Long)

  /** Smoothed point (the gate's columns, epoch for day). */
  final case class EwmaPoint(series: String, epoch: Long, x: Long,
      ewma: Long)

  /** Keyed state (public — the state encoder's generated code
    * constructs it). */
  final case class St(lastEpoch: Long, ewma: Long, seeded: Boolean)

  private def update(series: String, it: Iterator[Bucket],
      state: GroupState[St]): Iterator[EwmaPoint] = {
    var st = state.getOption.getOrElse(St(Long.MinValue, 0L, false))
    val out = scala.collection.mutable.ArrayBuffer.empty[EwmaPoint]
    it.toSeq.sortBy(_.epoch).foreach { b =>
      if (b.epoch > st.lastEpoch) {
        val e =
          if (!st.seeded) b.x
          else (st.ewma + b.x) / 2L // Java / ≡ Spark div (truncation)
        st = St(b.epoch, e, true)
        out += EwmaPoint(series, b.epoch, b.x, e)
      }
    }
    state.update(st)
    out.iterator
  }

  /** EWMA points over a (possibly streaming) bucket frame; one output
    * row per consumed bucket, Append-compatible.
    */
  def monitor(spark: SparkSession, buckets: Dataset[Bucket])
      : Dataset[EwmaPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    buckets
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch reference: the same recursion as a sequential fold. */
  def reference(buckets: Seq[Bucket]): Seq[EwmaPoint] =
    buckets.groupBy(_.series).toSeq.flatMap { case (series, bs) =>
      var last = Long.MinValue
      var ewma = 0L
      var seeded = false
      bs.sortBy(_.epoch).flatMap { b =>
        if (b.epoch <= last) None
        else {
          last = b.epoch
          ewma = if (!seeded) b.x else (ewma + b.x) / 2L
          seeded = true
          Some(EwmaPoint(series, b.epoch, b.x, ewma))
        }
      }
    }
}
