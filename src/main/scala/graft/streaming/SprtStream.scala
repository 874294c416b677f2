package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming SPRT monitor: Wald's sequential probability ratio test in
  * its TRUE online form — the batch `stats_sprt_monitor` gate replays
  * the daily ledger; this object is the monitor a platform deploys,
  * consuming cohort buckets as they close and STOPPING at the first
  * boundary crossing (the whole point of the sequential design: the
  * decision latches, later data is not consumed, error rates hold).
  *
  * The LLR is exact: with hypotheses p₀/p₁ fixed up front, each
  * conversion contributes the CONSTANT ln(p₁/p₀) and each
  * non-conversion ln((1−p₁)/(1−p₀)) — both micro-quantized once
  * ([[mlnMicro]], the same DECIMAL(18,6) half-up quantization the
  * batch gate's oracle applies), so the running statistic is
  * c·lnA + (n−c)·lnB over exact cumulative integer counts, identical
  * at any micro-batching.
  *
  * Scale design: state is four fields per experiment (last epoch,
  * cumulative n and c, the latched decision) — experiment-count
  * bounded, uniform keys. Buckets must arrive per-experiment in
  * non-decreasing epoch order across micro-batches (within one, the
  * group iterator is sorted here); a bucket at or before the last
  * consumed epoch is a late duplicate of a closed cohort and drops.
  */
object SprtStream {

  /** One closed cohort bucket: `trials` users entered at `epoch`,
    * `conversions` of them converted. */
  final case class Bucket(experiment: String, epoch: Long, trials: Long,
      conversions: Long)

  /** Monitor output after consuming a bucket. */
  final case class SprtPoint(experiment: String, epoch: Long,
      cumTrials: Long, cumConversions: Long, llrMicro: Long,
      decision: String)

  /** Keyed state (public — the state encoder's generated code
    * constructs it). `decided` latches at the first crossing. */
  final case class St(lastEpoch: Long, n: Long, c: Long,
      decided: String)

  /** Fixed design constants in micro-nats: per-conversion and
    * per-non-conversion LLR increments, Wald upper/lower boundaries.
    */
  final case class Params(lnAMicro: Long, lnBMicro: Long,
      upperMicro: Long, lowerMicro: Long)

  /** ln(x) quantized to micro-nats exactly as the batch oracle does:
    * DECIMAL(18,6) half-up, then ×10⁶. */
  def mlnMicro(x: Double): Long =
    (BigDecimal(math.log(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000)
      .toLongExact

  /** Wald design: H₀ conversion p0 vs H₁ p1 at error rates (α, β). */
  def design(p0: Double, p1: Double, alpha: Double,
      beta: Double): Params =
    Params(mlnMicro(p1 / p0), mlnMicro((1 - p1) / (1 - p0)),
      mlnMicro((1 - beta) / alpha), mlnMicro(beta / (1 - alpha)))

  private def decide(p: Params, llr: Long): String =
    if (llr >= p.upperMicro) "reject_h0"
    else if (llr <= p.lowerMicro) "accept_h0"
    else "continue"

  private def update(p: Params)(experiment: String,
      it: Iterator[Bucket], state: GroupState[St])
      : Iterator[SprtPoint] = {
    var st = state.getOption.getOrElse(St(Long.MinValue, 0L, 0L,
      "continue"))
    val out = scala.collection.mutable.ArrayBuffer.empty[SprtPoint]
    it.toSeq.sortBy(_.epoch).foreach { b =>
      // sampling STOPS once decided; closed-cohort duplicates drop
      if (b.epoch > st.lastEpoch && st.decided == "continue") {
        val n = st.n + b.trials
        val c = st.c + b.conversions
        val llr = c * p.lnAMicro + (n - c) * p.lnBMicro
        val d = decide(p, llr)
        st = St(b.epoch, n, c, d)
        out += SprtPoint(experiment, b.epoch, n, c, llr, d)
      }
    }
    state.update(st)
    out.iterator
  }

  /** SPRT points over a (possibly streaming) bucket frame — one row
    * per consumed bucket, none after the decision latches. */
  def monitor(spark: SparkSession, buckets: Dataset[Bucket],
      params: Params): Dataset[SprtPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    buckets
      .groupByKey(_.experiment)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(params))
  }

  /** Batch reference: the same latching fold, sequential — what
    * [[monitor]] must reproduce for any micro-batching. */
  def reference(buckets: Seq[Bucket], params: Params)
      : Seq[SprtPoint] =
    buckets.groupBy(_.experiment).toSeq.flatMap { case (exp, bs) =>
      var (n, c) = (0L, 0L)
      var last = Long.MinValue
      var decided = "continue"
      bs.sortBy(_.epoch).flatMap { b =>
        if (b.epoch <= last || decided != "continue") None
        else {
          n += b.trials; c += b.conversions; last = b.epoch
          val llr = c * params.lnAMicro + (n - c) * params.lnBMicro
          decided = decide(params, llr)
          Some(SprtPoint(exp, b.epoch, n, c, llr, decided))
        }
      }
    }
}
