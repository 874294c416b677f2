package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the `events_scd2_intervals` batch gate: the
  * CDC-style SCD-2 build, maintained incrementally. Each user's open
  * segment (type, start, count) lives in keyed state; when an arriving
  * event's type differs from the open segment's, the segment CLOSES —
  * one output row, end_us = the new event's time — and a new segment
  * opens. Late duplicates of consumed positions are dropped
  * (TransitionStream's exactly-once discipline).
  *
  * Append-mode contract: only CLOSED intervals are emitted (the open
  * tail segment has no end yet — the batch gate's null-end_us row);
  * Scd2StreamSpec proves the streamed closed set equals the batch
  * relation's closed subset for any order-preserving micro-batching.
  *
  * Scale design: O(1) state per user (one open segment — exactly the
  * carry a partition-boundary merge of the batch islands construction
  * would hand across), uniform user_id keys. Segment numbering rides
  * the state counter, so emitted seg ids match the batch running-sum
  * numbering.
  */
object Scd2Stream {

  /** One event; (us, event_id) is the unique per-user total order. */
  final case class Ev(user_id: Long, us: Long, event_id: Long,
      event_type: String)

  /** One CLOSED validity interval. */
  final case class Segment(user_id: Long, seg: Long, event_type: String,
      start_us: Long, end_us: Long, n_events: Long)

  /** Keyed state: the OPEN segment (public — the state encoder's
    * generated code constructs it). */
  final case class Open(seg: Long, eventType: String, startUs: Long,
      nEvents: Long, lastUs: Long, lastId: Long)

  private def update(user: Long, it: Iterator[Ev],
      state: GroupState[Open]): Iterator[Segment] = {
    var open = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[Segment]
    it.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
      val fresh = open.forall(o =>
        Ordering[(Long, Long)].lt((o.lastUs, o.lastId), (e.us, e.event_id)))
      if (fresh) {
        open match {
          case Some(o) if o.eventType == e.event_type =>
            open = Some(o.copy(nEvents = o.nEvents + 1,
              lastUs = e.us, lastId = e.event_id))
          case Some(o) =>
            out += Segment(user, o.seg, o.eventType, o.startUs, e.us,
              o.nEvents)
            open = Some(Open(o.seg + 1, e.event_type, e.us, 1L,
              e.us, e.event_id))
          case None =>
            open = Some(Open(1L, e.event_type, e.us, 1L, e.us, e.event_id))
        }
      }
    }
    open.foreach(state.update)
    out.iterator
  }

  /** Closed segments over a (possibly streaming) event frame. */
  def closedSegments(spark: SparkSession, events: Dataset[Ev])
      : Dataset[Segment] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch reference: the sequential islands fold — what
    * [[closedSegments]] must reproduce for any order-preserving
    * micro-batching (closed segments only). */
  def reference(events: Seq[Ev]): Seq[Segment] =
    events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.us, e.event_id))
      val segs = scala.collection.mutable.ArrayBuffer.empty[Segment]
      var open: Option[Open] = None
      sorted.foreach { e =>
        open match {
          case Some(o) if o.eventType == e.event_type =>
            open = Some(o.copy(nEvents = o.nEvents + 1))
          case Some(o) =>
            segs += Segment(u, o.seg, o.eventType, o.startUs, e.us, o.nEvents)
            open = Some(Open(o.seg + 1, e.event_type, e.us, 1L, e.us,
              e.event_id))
          case None =>
            open = Some(Open(1L, e.event_type, e.us, 1L, e.us, e.event_id))
        }
      }
      segs
    }
}
