package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming log-histogram quantile sketch: the mergeable fixed-bucket
  * histogram behind the batch `ts_quantile_sketch` gate, maintained
  * incrementally per key. The state is bucket → count — at most
  * ~1 000 longs per key regardless of row volume (the property that
  * makes histogram quantiles streamable at all; exact quantiles would
  * buffer every distinct value) — and merging a micro-batch is
  * count addition, so the estimate after any stream prefix equals the
  * batch query over that prefix bit-for-bit: same micros rounding,
  * same bucket id, same integer rank threshold, same lower-bound
  * representative. HistStreamSpec asserts that equality against the
  * batch gate across micro-batch splits.
  *
  * Scale: keyed shuffle on the series key, Update output mode (one
  * refreshed estimate row per key per micro-batch).
  */
object HistStream {

  final case class HistEvent(event_type: String, value: Double)
  final case class HistQuantiles(event_type: String, seq: Long, n: Long,
      est50: Double, est90: Double, est99: Double)

  val Percentiles: Seq[Int] = Seq(50, 90, 99)

  /** The batch gate's integer domain: the 6-decimal rounding of the
    * double, ×10^6 — replicated exactly ([[graft.functions.Cols]]
    * micros6 goes through the same shortest-representation BigDecimal
    * rounding Spark's double→DECIMAL(18,6) cast applies), INCLUDING
    * the domain bound: |value| ≥ 10^12 overflows DECIMAL(18,6) and
    * errors loudly under ANSI in the batch path, so the stream rejects
    * it identically rather than silently widening the contract.
    */
  def micros6(v: Double): Long = {
    val m = new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
    if (math.abs(m) > 999999999999999999L)
      throw new ArithmeticException(
        s"value $v overflows DECIMAL(18,6) - outside the batch gate's domain")
    m
  }

  /** Bucket id: 16 sub-buckets per power of two (top 4 mantissa bits),
    * exact for m < 16 — including m = 0 (a value > 0 that rounds to
    * zero micros lands in bucket 0, exactly as the batch SQL's
    * `CASE WHEN m < 16 THEN m` does). Mirrors `(bitlen-1)*16 + top4`.
    */
  def bucket(m: Long): Long = {
    require(m >= 0, s"histogram domain is non-negative micros, got $m")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(m)
    if (m < 16) m else e * 16 + ((m >>> (e - 4)) & 15)
  }

  /** The bucket's lower bound (the quantile representative). */
  def lowerBound(bkt: Long): Long =
    if (bkt < 16) bkt
    else {
      val e = bkt / 16
      (16 + (bkt % 16)) << (e - 4)
    }

  final case class HistState(seq: Long, counts: Map[Long, Long])

  /** Smallest bucket whose cumulative count reaches
    * ceil(p·n/100) = (p·n + 99) div 100 — the batch gate's integer
    * threshold exactly.
    */
  private def quantile(counts: Map[Long, Long], n: Long, p: Int): Double = {
    val k = (p * n + 99) / 100
    var cum = 0L
    for ((bkt, c) <- counts.toSeq.sortBy(_._1)) {
      cum += c
      if (cum >= k) return lowerBound(bkt).toDouble / 1000000.0
    }
    Double.NaN // unreachable for n > 0
  }

  private def update(key: String, events: Iterator[HistEvent],
      state: GroupState[HistState]): Iterator[HistQuantiles] = {
    val prev = state.getOption.getOrElse(HistState(0L, Map.empty))
    var counts = prev.counts
    // the batch gate's predicate exactly: filter on the RAW value
    // (values in (0, 5e-7) round to 0 micros and still count, in
    // bucket 0 — dropping them here would silently diverge)
    for (e <- events if e.value > 0) {
      val b = bucket(micros6(e.value))
      counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
    }
    state.update(HistState(prev.seq + 1, counts))
    val n = counts.valuesIterator.sum
    // a key whose events were ALL filtered out has no batch row
    // (`WHERE value > 0` drops the group) — emit none, not NaNs
    if (n == 0) Iterator.empty
    else Iterator(HistQuantiles(key, prev.seq + 1, n,
      quantile(counts, n, 50), quantile(counts, n, 90),
      quantile(counts, n, 99)))
  }

  /** Incrementally-maintained per-key quantile estimates over a
    * (possibly streaming) frame of (event_type, value). Update mode:
    * the row with the greatest `seq` per key is current; a key with no
    * in-domain values yet emits nothing (exactly the batch relation).
    */
  def estimates(spark: SparkSession, events: Dataset[HistEvent])
      : Dataset[HistQuantiles] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }
}
