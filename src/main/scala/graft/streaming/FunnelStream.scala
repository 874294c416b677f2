package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel: the stateful-stream counterpart of the
  * batch `funnel_signup_purchase` gate — per user, did a purchase land
  * in the 7 days after the FIRST signup?
  *
  * This is genuine custom keyed state (`flatMapGroupsWithState` with
  * event-time timeouts), not a windowed aggregate: the conversion
  * window opens at a data-dependent time (the user's first signup) and
  * must tolerate out-of-order arrivals in either direction (a purchase
  * can be seen before its signup).
  *
  * State per user, bounded by the watermark contract:
  *  - `sUs`: earliest signup micros seen. Final once the watermark
  *    passes it (older signups can no longer arrive).
  *  - `purchases`: buffered purchase micros. A purchase is kept ONLY
  *    while it could still fall in some yet-unknown conversion window:
  *    once a signup is known, only micros in (sUs, sUs + window] are
  *    retained; with no signup yet, purchases older than the watermark
  *    are dropped (a future signup must carry event time ≥ the
  *    watermark, so those purchases can never follow it). Bounded by
  *    purchases-per-user-per-window.
  *
  * Emission: exactly one row per signing-up user, when the watermark
  * passes `sUs + window` (event-time timeout) — the window can neither
  * gain purchases nor move earlier after that. Append mode; the
  * per-day funnel report is then a BATCH aggregate over the sink, the
  * same stream ≡ batch split as [[AnomalyStream]].
  */
object FunnelStream {

  final case class FunnelEvent(user_id: Long, event_type: String, us: Long)

  /** `emitted` is the tombstone: the batch relation keys on the
    * user's GLOBAL first signup, so after the conversion row is
    * emitted the key must stay marked — otherwise a later re-signup
    * would open a second window and emit a duplicate. One tombstone
    * per ever-signed-up user, i.e. exactly the batch output
    * cardinality; a production job bounds it with an attribution
    * horizon (drop tombstones once re-signup windows stop mattering).
    */
  final case class FunnelState(sUs: Long, purchases: List[Long],
      emitted: Boolean)
  final case class Conversion(user_id: Long, signup_us: Long,
      converted: Long)

  val WindowUs: Long = 7L * 24 * 3600 * 1000000

  private def decide(st: FunnelState): Conversion =
    Conversion(0L, st.sUs,
      if (st.purchases.exists(p => p > st.sUs && p <= st.sUs + WindowUs)) 1L
      else 0L)

  private def updateUser(userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[Conversion] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    if (state.hasTimedOut) {
      val st = state.getOption
      st.filter(s => s.sUs != Long.MaxValue && !s.emitted) match {
        case Some(s) =>
          // keep the tombstone (no new timeout): later re-signups of
          // this user must not open a second window
          state.update(FunnelState(s.sUs, Nil, emitted = true))
          return Iterator.single(decide(s).copy(user_id = userId))
        case None =>
          state.remove() // purchase-only state: pure GC
          return Iterator.empty
      }
    }
    val prev = state.getOption
      .getOrElse(FunnelState(Long.MaxValue, Nil, emitted = false))
    if (prev.emitted) {
      state.update(prev) // tombstone: swallow further events
      return Iterator.empty
    }
    var sUs = prev.sUs
    var purchases = prev.purchases
    events.foreach { e =>
      e.event_type match {
        case "signup" => if (e.us < sUs) sUs = e.us
        case "purchase" => purchases ::= e.us
        case _ => ()
      }
    }
    // retention: with a signup known keep only window-relevant
    // purchases; without one, drop purchases the watermark has passed
    // (no future signup can precede them)
    purchases =
      if (sUs != Long.MaxValue)
        purchases.filter(p => p > sUs && p <= sUs + WindowUs)
      else purchases.filter(_ >= wmUs)

    if (sUs != Long.MaxValue && sUs + WindowUs <= wmUs) {
      // window already closed (a very late signup): everything that
      // can fall inside it has arrived — emit now, leave the tombstone
      val out = decide(FunnelState(sUs, purchases, emitted = false))
        .copy(user_id = userId)
      state.update(FunnelState(sUs, Nil, emitted = true))
      Iterator.single(out)
    } else if (sUs == Long.MaxValue && purchases.isEmpty) {
      // nothing retained (no signup; every purchase already aged past
      // the watermark): keep NO state rather than an empty record
      // with no timeout
      state.remove()
      Iterator.empty
    } else {
      state.update(FunnelState(sUs, purchases, emitted = false))
      if (sUs != Long.MaxValue)
        state.setTimeoutTimestamp((sUs + WindowUs) / 1000L + 1L)
      else
        // purchase-only user: garbage-collect once the watermark has
        // passed every buffered purchase
        state.setTimeoutTimestamp(purchases.max / 1000L + 1L)
      Iterator.empty
    }
  }

  /** Per-user conversion rows over a (possibly streaming) event frame.
    * Input columns: user_id, event_type, ts (timestamp). Output: one
    * row per user with ≥1 signup, emitted when the conversion window
    * closes.
    */
  def conversions(spark: SparkSession, events: Dataset[FunnelEvent],
      watermarkDelay: String): Dataset[Conversion] = {
    import spark.implicits._
    events
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.col("us")))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
