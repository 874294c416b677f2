package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the `store_merge_upsert` batch gate: the CDC
  * upsert view maintained incrementally — what a Delta/Iceberg MERGE
  * becomes when the changeset arrives as a stream. Each merge key
  * holds one accumulator in keyed state (snapshot base, running
  * delta, change count); every micro-batch re-emits the key's CURRENT
  * merged row (Update mode — the CDF-style changelog), so the latest
  * emission per key IS the merged snapshot:
  *
  *  - key in the snapshot → `updated`, balance = base + Σdelta;
  *  - unknown key → `inserted`, balance = Σdelta;
  *  - a matched key whose change count crosses the hot threshold is
  *    re-emitted with `deleted = true` — the tombstone a downstream
  *    materialization uses to drop the row (the batch gate's
  *    WHEN MATCHED AND hot DELETE branch, arriving late).
  *
  * Scale design: O(1) state per key (three longs — NOT the change
  * history), uniform merge-key partitioning; the snapshot base rides
  * in on the changes via a stream-static join upstream (the caller
  * attaches it), so the stateful operator never holds the snapshot.
  * All money stays in exact 6-decimal integer micros — the streamed
  * balance is bit-equal to the batch gate's decimal arithmetic.
  * Input contract: each change row is delivered once per key-batch
  * pipeline (an at-least-once source would carry a change id for the
  * dedup-set discipline DedupStream demonstrates).
  */
object MergeStream {

  /** One CDC change: key, snapshot base (valid iff hasBase), delta. */
  final case class Chg(k: Long, baseMicros: Long, hasBase: Boolean,
      deltaMicros: Long)

  /** Current merged row for a key; `n` is the monotone change count
    * (the emission with max n per key is the latest view). */
  final case class MergeRow(k: Long, balanceMicros: Long, src: String,
      deleted: Boolean, n: Long)

  /** Keyed state (public — the state encoder constructs it). */
  final case class Acc(baseMicros: Long, hasBase: Boolean,
      deltaMicros: Long, n: Long)

  /** Matched keys with at least this many changes are tombstoned —
    * mirrors the batch gate's `n_orders >= 3` delete branch. */
  val HotThreshold = 3L

  private def update(k: Long, it: Iterator[Chg],
      state: GroupState[Acc]): MergeRow = {
    var acc = state.getOption.getOrElse(Acc(0L, hasBase = false, 0L, 0L))
    it.foreach { c =>
      acc = Acc(
        baseMicros = if (c.hasBase) c.baseMicros else acc.baseMicros,
        hasBase = acc.hasBase || c.hasBase,
        deltaMicros = acc.deltaMicros + c.deltaMicros,
        n = acc.n + 1)
    }
    state.update(acc)
    MergeRow(k,
      (if (acc.hasBase) acc.baseMicros else 0L) + acc.deltaMicros,
      if (acc.hasBase) "updated" else "inserted",
      acc.hasBase && acc.n >= HotThreshold,
      acc.n)
  }

  /** The merged-view changelog over a (possibly streaming) change
    * frame; write with OutputMode.Update. */
  def upsertView(spark: SparkSession, changes: Dataset[Chg])
      : Dataset[MergeRow] = {
    import spark.implicits._
    changes.groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
