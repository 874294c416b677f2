package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution: the stateful-stream counterpart
  * of the batch `attr_last_touch` gate — every purchase is credited to
  * the latest click/view at-or-before it by the same user.
  *
  * Unlike [[AsOfStream]] (broadcast-dimension regime: a bounded,
  * slowly-changing build side), BOTH sides here are the same unbounded
  * event stream, so this is the bounded-keyed-state regime
  * (`flatMapGroupsWithState` + event-time timeout):
  *
  *  - a purchase at p cannot be finalized before the watermark passes
  *    p — an out-of-order touch with ts ≤ p may still arrive — so
  *    purchases buffer until `p < watermark`, then emit exactly once
  *    (Append mode) via the event-time timeout;
  *  - of the touches at-or-before the watermark only the LATEST one
  *    (max (ts, id)) can ever win for a future purchase (every future
  *    purchase has ts ≥ watermark), so the touch buffer compacts to
  *    the in-flight suffix plus one row — state per user is bounded by
  *    the event rate within the watermark horizon, exactly like
  *    [[FunnelStream]]'s purchase buffer.
  *
  * Touch-only state (users who never purchase again) is retained like
  * FunnelStream's tombstones; a production job bounds it with an
  * attribution horizon (drop the compacted touch once no purchase may
  * look that far back).
  */
object AttributionStream {

  final case class TouchEvent(event_id: Long, user_id: Long,
      event_type: String, us: Long)
  final case class Attribution(event_id: Long, user_id: Long, ts_us: Long,
      touch_id: Option[Long], touch_type: Option[String])

  /** touches: (us, id, type); pending purchases: (us, id). */
  final case class AttrState(touches: List[(Long, Long, String)],
      pending: List[(Long, Long)])

  /** Latest touch at-or-before `us`; ties on ts break to max id —
    * the batch gate's deterministic tie rule. */
  private def lastTouch(touches: List[(Long, Long, String)],
      us: Long): Option[(Long, Long, String)] =
    touches.filter(_._1 <= us) match {
      case Nil => None
      case hit => Some(hit.maxBy(t => (t._1, t._2)))
    }

  private def updateUser(userId: Long, events: Iterator[TouchEvent],
      state: GroupState[AttrState]): Iterator[Attribution] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    var st = state.getOption.getOrElse(AttrState(Nil, Nil))
    if (!state.hasTimedOut) {
      events.foreach { e =>
        if (e.event_type == "purchase")
          st = st.copy(pending = (e.us, e.event_id) :: st.pending)
        else if (e.event_type == "click" || e.event_type == "view")
          st = st.copy(touches = (e.us, e.event_id, e.event_type) :: st.touches)
      }
    }
    // ripe purchases: strictly below the watermark — an arrival AT the
    // watermark is still admissible, so equality must keep buffering
    val (ripe, still) = st.pending.partition(_._1 < wmUs)
    val out = ripe.sortBy(identity).map { case (pus, pid) =>
      val tch = lastTouch(st.touches, pus)
      Attribution(pid, userId, pus, tch.map(_._2), tch.map(_._3))
    }
    // compact the touch buffer: every future/pending purchase has
    // ts ≥ watermark, so among touches below the watermark only the
    // max-(ts, id) one can still win — keep it, drop the rest
    val (live, past) = st.touches.partition(_._1 >= wmUs)
    val keep = if (past.isEmpty) live
      else past.maxBy(t => (t._1, t._2)) :: live
    st = AttrState(keep, still)
    if (st.touches.isEmpty && st.pending.isEmpty) state.remove()
    else {
      state.update(st)
      if (still.nonEmpty)
        state.setTimeoutTimestamp(still.map(_._1).min / 1000L + 1L)
    }
    out.iterator
  }

  /** Attribution rows over a (possibly streaming) event frame. Input
    * columns: event_id, user_id, event_type, us (epoch micros). One
    * output row per purchase, emitted when the watermark passes it.
    */
  def attributions(spark: SparkSession, events: Dataset[TouchEvent],
      watermarkDelay: String): Dataset[Attribution] = {
    import spark.implicits._
    events
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.col("us")))
      .withWatermark("ts", watermarkDelay)
      .as[TouchEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
