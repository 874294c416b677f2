package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed custom state via flatMapGroupsWithState — the streaming form
  * of the reference's per-account in-memory caches
  * (lib/aggregation/accountPayments.js:30-46, SURVEY §2.10 T2): each
  * account's rolling payment profile is carried as typed state across
  * micro-batches, with a processing-time TTL standing in for the
  * reference's hourly cache purge.
  */
object AccountState {

  /** Input event: one payment leg attributed to an account. */
  final case class PaymentEvent(
      account: String,
      counterparty: String,
      amount: Double,
      time: Long)

  /** Carried state / emitted profile. */
  final case class AccountProfile(
      account: String,
      payments: Long,
      total: Double,
      high: Double,
      last_time: Long)

  def updateProfile(withTtl: Boolean)(
      account: String,
      events: Iterator[PaymentEvent],
      state: GroupState[AccountProfile]): Iterator[AccountProfile] = {
    if (state.hasTimedOut) {
      // hourly purge analogue (accountPayments.js:30-46)
      val last = state.get
      state.remove()
      Iterator.single(last)
    } else {
      val prev = state.getOption.getOrElse(AccountProfile(account, 0L, 0d, 0d, 0L))
      val updated = events.foldLeft(prev) { (p, e) =>
        AccountProfile(
          account = account,
          payments = p.payments + 1,
          total = p.total + e.amount,
          high = math.max(p.high, e.amount),
          last_time = math.max(p.last_time, e.time))
      }
      state.update(updated)
      if (withTtl) state.setTimeoutDuration("1 hour")
      Iterator.single(updated)
    }
  }

  /** Wire the stateful update over a (possibly streaming) event set.
    * `withTtl` enables the hourly cache-purge analogue; note the
    * engine then schedules extra timeout-evaluation batches.
    */
  def runningProfiles(spark: SparkSession, events: Dataset[PaymentEvent],
      withTtl: Boolean = false): Dataset[AccountProfile] = {
    import spark.implicits._
    val timeout =
      if (withTtl) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.account)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(updateProfile(withTtl))
  }
}
