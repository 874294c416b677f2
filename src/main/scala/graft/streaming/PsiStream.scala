package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming PSI drift monitor: the batch `dq_psi_drift` gate splits
  * history in half; this object is the monitor a platform deploys —
  * the REFERENCE histogram is frozen at calibration time, live bucket
  * counts accumulate in keyed state as daily slices close, and each
  * consumed day emits the population-stability index of the
  * distribution-so-far against the reference.
  *
  * Arithmetic matches the batch gate: Laplace(+1) smoothing on the
  * fixed B-bucket grid, each bucket's term
  * (p_cur − p_ref)·ln(p_cur/p_ref) carried as the exact integer
  * cross-product times the micro-quantized ln ratio ([[SprtStream
  * .mlnMicro]]'s DECIMAL(18,6) half-up quantization), summed in Long
  * and divided once — so any micro-batching reproduces the sequential
  * fold bit-for-bit.
  *
  * Scale design: state is B+1 longs per monitored series
  * (series-count bounded); slices must arrive per-series in
  * non-decreasing epoch order across micro-batches (sorted within
  * one); a slice at or before the last consumed epoch is a late
  * duplicate of a closed day and drops.
  */
object PsiStream {

  /** One closed daily histogram slice: counts(b) arrivals in value
    * bucket b on `epoch`. `counts` must have exactly B entries. */
  final case class Slice(series: String, epoch: Long,
      counts: Seq[Long])

  /** Monitor output after consuming a slice. */
  final case class PsiPoint(series: String, epoch: Long, nCur: Long,
      psiMicro: Long, drifted: Boolean)

  /** Keyed state: last consumed epoch + cumulative live counts. */
  final case class St(lastEpoch: Long, cum: Seq[Long])

  /** Fixed design: the frozen reference histogram (B buckets, total
    * nRef) and the alarm threshold in micro-nats (0.2 ⇒ 200000). */
  final case class Params(ref: Seq[Long], thresholdMicro: Long) {
    val b: Int = ref.size
    val nRef: Long = ref.sum
  }

  /** PSI of cumulative counts vs the reference — the exact fold both
    * the stream and the batch reference share.
    *
    * The cross-products are widened to BigInt: `num` is
    * O(cum_count · (nRef+B)) and `lnm` is up to ~2e7 micro-nats, so a
    * Long accumulator would silently wrap once cumulative live counts
    * reach the low millions against a skewed reference — a monitor
    * whose whole job is to not be silently wrong. The final floor
    * division happens in BigInt too (the divisor has the same
    * headroom limit), then narrows: |PSI| in micro-nats fits a Long
    * by construction (PSI of two (B+n)-smoothed histograms is bounded
    * by ln of the larger count ratio, ≪ 2^63 micro-nats).
    */
  def psiMicro(p: Params, cum: Seq[Long]): Long = {
    val nCur = cum.sum
    var acc = BigInt(0)
    var i = 0
    while (i < p.b) {
      val cr = p.ref(i) + 1
      val cc = cum(i) + 1
      val num = BigInt(cc) * (p.nRef + p.b) - BigInt(cr) * (nCur + p.b)
      val lnm = SprtStream.mlnMicro(
        cc.toDouble * (p.nRef + p.b) / (cr.toDouble * (nCur + p.b)))
      acc += num * lnm
      i += 1
    }
    val den = BigInt(p.nRef + p.b) * (nCur + p.b)
    // BigInt / truncates toward zero; floor it like Math.floorDiv
    val q = acc / den
    (if (acc.sign * den.sign < 0 && q * den != acc) q - 1 else q).toLong
  }

  private def update(p: Params)(series: String, it: Iterator[Slice],
      state: GroupState[St]): Iterator[PsiPoint] = {
    var st = state.getOption.getOrElse(
      St(Long.MinValue, Seq.fill(p.b)(0L)))
    val out = scala.collection.mutable.ArrayBuffer.empty[PsiPoint]
    it.toSeq.sortBy(_.epoch).foreach { s =>
      if (s.epoch > st.lastEpoch) {
        require(s.counts.size == p.b,
          s"slice has ${s.counts.size} buckets, design has ${p.b}")
        val cum = st.cum.zip(s.counts).map { case (a, x) => a + x }
        st = St(s.epoch, cum)
        val psi = psiMicro(p, cum)
        out += PsiPoint(series, s.epoch, cum.sum, psi,
          psi > p.thresholdMicro)
      }
    }
    state.update(st)
    out.iterator
  }

  /** PSI points over a (possibly streaming) slice frame — one row per
    * consumed slice. */
  def monitor(spark: SparkSession, slices: Dataset[Slice],
      params: Params): Dataset[PsiPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    slices
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(params))
  }

  /** Batch reference: the same cumulative fold, sequential. */
  def reference(slices: Seq[Slice], params: Params): Seq[PsiPoint] =
    slices.groupBy(_.series).toSeq.flatMap { case (series, ss) =>
      var cum = Seq.fill(params.b)(0L)
      var last = Long.MinValue
      ss.sortBy(_.epoch).flatMap { s =>
        if (s.epoch <= last) None
        else {
          cum = cum.zip(s.counts).map { case (a, x) => a + x }
          last = s.epoch
          val psi = psiMicro(params, cum)
          Some(PsiPoint(series, s.epoch, cum.sum, psi,
            psi > params.thresholdMicro))
        }
      }
    }
}
