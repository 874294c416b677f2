package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the `events_transitions` batch gate: per-user
  * first-order Markov transitions (from_type → to_type) emitted
  * incrementally as events arrive.
  *
  * State per user is ONE event — the latest (us, event_id, type)
  * consumed — so a transition is emitted exactly once, when its
  * destination event arrives: prev-state → first-of-batch, then each
  * consecutive pair inside the (sorted) batch. An event at or before
  * the last consumed (us, event_id) order key is a late duplicate of
  * a closed position and is dropped, mirroring CusumStream's
  * exactly-once bucket consumption.
  *
  * Scale design: O(1) state per user (the one-row "last event" the
  * batch LEAD window would carry at the partition boundary), uniform
  * user_id keys, shuffle-on-key — the same partitioning the batch
  * gate's single window exchange uses. Downstream, the transition
  * MATRIX is a plain streaming aggregation over the emitted pairs
  * (≤ |types|² keys of mergeable long counts).
  *
  * Contract: each user's events must arrive in non-decreasing
  * (us, event_id) order ACROSS micro-batches (within a batch the
  * group iterator is sorted here) — the watermark-ordered replay of
  * an event log satisfies this; TransitionStreamSpec proves stream ≡
  * batch for any such split.
  */
object TransitionStream {

  /** One event of a user's stream; (us, event_id) is the unique total
    * order the batch gate's LEAD window uses. */
  final case class Ev(user_id: Long, us: Long, event_id: Long,
      event_type: String)

  /** One emitted transition: `us` is the DESTINATION event's time. */
  final case class Transition(user_id: Long, from_type: String,
      to_type: String, us: Long)

  /** Keyed state: the last consumed event (public — the state
    * encoder's generated code constructs it). */
  final case class Last(us: Long, eventId: Long, eventType: String)

  private def ord(us: Long, id: Long): (Long, Long) = (us, id)

  private def update(user: Long, it: Iterator[Ev],
      state: GroupState[Last]): Iterator[Transition] = {
    var last = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    it.toSeq.sortBy(e => ord(e.us, e.event_id)).foreach { e =>
      val fresh = last.forall(l =>
        Ordering[(Long, Long)].lt(ord(l.us, l.eventId),
          ord(e.us, e.event_id)))
      if (fresh) {
        last.foreach(l =>
          out += Transition(user, l.eventType, e.event_type, e.us))
        last = Some(Last(e.us, e.event_id, e.event_type))
      }
    }
    last.foreach(state.update)
    out.iterator
  }

  /** Transitions over a (possibly streaming) event frame; one output
    * row per consumed non-first event. Append-compatible via
    * flatMapGroupsWithState.
    */
  def transitions(spark: SparkSession, events: Dataset[Ev])
      : Dataset[Transition] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch reference: the same per-user fold run sequentially — what
    * [[transitions]] must reproduce for any micro-batching that
    * preserves per-user (us, event_id) order. */
  def reference(events: Seq[Ev]): Seq[Transition] =
    events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => ord(e.us, e.event_id))
      sorted.zip(sorted.drop(1)).map { case (a, b) =>
        Transition(u, a.event_type, b.event_type, b.us)
      }
    }
}
