package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming top-k per key: the incremental twin of the batch custom
  * operator ([[graft.plans.TopKPerKey]]) — the same bounded per-key
  * heap, maintained as keyed stream state. Arrivals fold into the
  * current top-k (at most k rows retained per key, ever); Update mode
  * emits the refreshed leaderboard per key per micro-batch.
  *
  * The invariant shared with the batch operator: top-k under a TOTAL
  * order is a semigroup fold (merge two top-k sets → top-k of the
  * union), so stream state ≡ batch partial pass, and the final
  * snapshot equals the batch answer on the same rows — asserted in
  * TopKStreamSpec.
  */
object TopKStream {

  final case class TopKEvent(key: String, id: Long, v: Double)

  /** Leaderboard snapshot: parallel arrays ordered best-first
    * (v desc, id asc). `seq` increases per key per micro-batch — the
    * row with the greatest seq is current.
    */
  final case class TopKSnapshot(key: String, seq: Long, ids: Seq[Long],
      vs: Seq[Double])

  final case class TopKState(seq: Long, ids: List[Long], vs: List[Double])

  private def update(k: Int)(key: String, events: Iterator[TopKEvent],
      state: GroupState[TopKState]): TopKSnapshot = {
    val prev = state.getOption.getOrElse(TopKState(0L, Nil, Nil))
    val merged = (prev.ids.zip(prev.vs).map(p => (p._2, p._1)) ++
        events.map(e => (e.v, e.id)))
      .sortBy { case (v, id) => (-v, id) }
      .take(k)
    state.update(TopKState(prev.seq + 1,
      merged.map(_._2).toList, merged.map(_._1).toList))
    TopKSnapshot(key, prev.seq + 1, merged.map(_._2), merged.map(_._1))
  }

  /** Incrementally-maintained per-key top-k over a (possibly
    * streaming) frame of (key, id, v), ordered by (v desc, id asc).
    */
  def topK(spark: SparkSession, events: Dataset[TopKEvent], k: Int)
      : Dataset[TopKSnapshot] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update(k))
  }
}
