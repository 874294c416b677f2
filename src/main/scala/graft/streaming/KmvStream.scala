package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV (k-minimum-values) distinct-count sketch: the
  * mergeable bottom-k state maintained incrementally per key — the
  * streaming counterpart of the batch `sketch_kmv_distinct` gate.
  *
  * This is what makes KMV the sketch of choice for pipelines: the
  * state is EXACTLY k hashes per key (mergeable, bounded — unlike the
  * exact-distinct aggregate whose state is the whole key set), and
  * merging arrivals is a sorted-bottom-k union. The estimate after
  * any prefix of the stream equals the batch estimate over that
  * prefix — same hash, same order statistic, same one double
  * division — which KmvStreamSpec asserts bit-for-bit against the
  * batch gate.
  *
  * Scale: state per key = k longs; keyed shuffle on the sketch key;
  * Update output mode (one refreshed estimate per key per
  * micro-batch).
  */
object KmvStream {

  final case class KmvEvent(event_type: String, user_id: Long)
  final case class KmvEstimate(event_type: String, seq: Long, n_kept: Long,
      kmv_est: Double)

  val K = 64

  /** 2^52 — the hash domain size (13 hex chars), matching the batch
    * gate's estimator scale.
    */
  val HashDomain: Double = 4503599627370496.0

  /** The batch gate's hash: first 13 hex chars of md5(user_id) parsed
    * base-16 — 52 bits, exact in a Long and in a Double.
    */
  def hashUser(userId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(userId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  final case class KmvState(seq: Long, bottom: List[Long])

  private def update(key: String, events: Iterator[KmvEvent],
      state: GroupState[KmvState]): KmvEstimate = {
    val prev = state.getOption.getOrElse(KmvState(0L, Nil))
    val merged = (prev.bottom ++ events.map(e => hashUser(e.user_id)))
      .distinct.sorted.take(K)
    state.update(KmvState(prev.seq + 1, merged))
    val n = merged.size
    val est =
      if (n < K) n.toDouble
      else (K - 1).toDouble * HashDomain / merged.last.toDouble
    KmvEstimate(key, prev.seq + 1, n.toLong, est)
  }

  /** Incrementally-maintained per-key estimates over a (possibly
    * streaming) frame of (event_type, user_id). Update mode: the row
    * with the greatest `seq` per key is the current estimate.
    */
  def estimates(spark: SparkSession, events: Dataset[KmvEvent])
      : Dataset[KmvEstimate] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
