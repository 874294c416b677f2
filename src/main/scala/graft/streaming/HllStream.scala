package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming HyperLogLog register sketch: the fixed-size mergeable
  * state maintained incrementally per key — the streaming counterpart
  * of the batch `sketch_hll_distinct` gate, and the reason HLL is THE
  * pipeline cardinality sketch: state per key is EXACTLY 64 small
  * integers at ANY cardinality (KMV's bottom-k is bounded too, but
  * register-max merge is cheaper than a sorted union, and registers
  * union across partitions/streams by plain elementwise max).
  *
  * The estimate after any prefix of the stream equals the batch gate's
  * estimate over that prefix — same hash, same register ranks, the
  * same exact scaled-integer harmonic sum and 6-decimal rounding —
  * which HllStreamSpec asserts bit-for-bit against the batch gate.
  *
  * Scale: state per key = 64 ints; keyed shuffle on the sketch key;
  * Update output mode (one refreshed estimate per key per
  * micro-batch).
  */
object HllStream {

  final case class HllEvent(event_type: String, user_id: Long)
  final case class HllEstimate(event_type: String, seq: Long,
      n_regs_used: Long, hll_est: Double)

  /** m = 64 registers (p = 6), over the 52-bit md5 hash the batch gate
    * and KMV share; 2^47 scales the harmonic sum to exact integers.
    */
  val M = 64
  val Pow47: Long = 1L << 47

  final case class HllState(seq: Long, regs: Seq[Int])

  /** Leading-zero rank of the 46 post-bucket bits: 47 − bitlength,
    * 47 for an all-zero remainder — the batch gate's CASE expression.
    */
  def rho(hv: Long): Int = {
    val rem = hv >> 6
    if (rem == 0L) 47
    else 47 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
  }

  /** The batch estimator, replicated exactly: scaled-integer harmonic
    * sum, linear-counting small-range branch, 6-decimal HALF_UP
    * rounding (the Decimal(18,6) cast both engines apply).
    */
  def estimate(regs: Seq[Int]): (Long, Double) = {
    val used = regs.count(_ > 0)
    val sUsed = regs.filter(_ > 0).map(r => 1L << (47 - r)).sum
    val s = sUsed + (M - used).toLong * Pow47
    val raw = 0.709 * 4096.0 * 140737488355328.0 / s.toDouble
    val est =
      if (raw <= 160.0 && used < M)
        M.toDouble * math.log(M.toDouble / (M - used).toDouble)
      else raw
    val rounded = new java.math.BigDecimal(est)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    (used.toLong, rounded)
  }

  private def update(key: String, events: Iterator[HllEvent],
      state: GroupState[HllState]): HllEstimate = {
    val prev = state.getOption.getOrElse(HllState(0L, Seq.fill(M)(0)))
    val regs = prev.regs.toArray
    events.foreach { e =>
      val hv = KmvStream.hashUser(e.user_id)
      val b = (hv % M).toInt
      val r = rho(hv)
      if (r > regs(b)) regs(b) = r
    }
    state.update(HllState(prev.seq + 1, regs.toSeq))
    val (used, est) = estimate(regs.toSeq)
    HllEstimate(key, prev.seq + 1, used, est)
  }

  /** Incrementally-maintained per-key estimates over a (possibly
    * streaming) frame of (event_type, user_id). Update mode: the row
    * with the greatest `seq` per key is the current estimate.
    */
  def estimates(spark: SparkSession, events: Dataset[HllEvent])
      : Dataset[HllEstimate] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
