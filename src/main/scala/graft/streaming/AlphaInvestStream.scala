package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming ONLINE FDR control by alpha-investing (Foster & Stine
  * 2008) — the sequential counterpart of the batch `stats_fdr_bh`
  * gate: BH needs all m p-values at once; a monitoring platform sees
  * an endless ordered stream of tests and must decide each one AT
  * ARRIVAL while keeping the false-discovery rate controlled. The
  * wealth mechanic does exactly that: each test bids part of the
  * current alpha-wealth; a rejection earns the payout back, a
  * non-rejection forfeits the bid — so discovery-rich streams keep
  * testing at meaningful levels while null streams spend themselves
  * quiet (the FDR guarantee).
  *
  * All accounting is exact integer micro-units, so any micro-batching
  * replays the sequential fold bit-for-bit:
  *
  *  - bid      α_t = W_t div 10,
  *  - reject   (p ≤ α_t): W_{t+1} = W_t − α_t + ω,
  *  - continue:           W_{t+1} = W_t − ⌊α_t·10⁶ / (10⁶ − α_t)⌋
  *    (the Foster–Stine α/(1−α) charge, floored once).
  *
  * The charge is ≤ ~W/9 < W, so wealth never goes negative and no
  * clamp is needed. State per stream is three longs (last seq,
  * wealth, test count) — stream-count bounded. Tests must arrive
  * per-stream in increasing `seq` order across micro-batches (sorted
  * within one); a test at or before the last consumed seq is a
  * duplicate and drops.
  */
object AlphaInvestStream {

  /** One arriving hypothesis test: p-value in micro units [0, 10⁶]. */
  final case class Test(stream: String, seq: Long, pMicro: Long)

  /** Decision record emitted per consumed test. */
  final case class Decision(stream: String, seq: Long, pMicro: Long,
      alphaMicro: Long, reject: Boolean, wealthMicro: Long)

  /** Keyed state (public — the state encoder's generated code
    * constructs it). */
  final case class St(lastSeq: Long, wealth: Long, nTests: Long)

  /** Design: initial alpha-wealth and the per-rejection payout, in
    * micro units (Foster–Stine take ω = α₀ = the FDR target). */
  final case class Params(w0Micro: Long, payoutMicro: Long)

  /** The canonical design: control at q = 0.05. */
  val Default: Params = Params(50000L, 50000L)

  /** Bid ceiling: 0.1 in micro units. Without it a discovery-rich
    * stream compounds wealth until α_t crosses 10⁶ and the α/(1−α)
    * charge flips sign (wealth would GROW on a loss) — the cap keeps
    * the charge positive, the arithmetic in range (α·10⁶ ≤ 10¹¹),
    * and the test level sane.
    */
  val AlphaMaxMicro = 100000L

  /** One wealth step — the exact fold both the stream and the batch
    * reference share. Returns (decision, newWealth). */
  def step(p: Params, wealth: Long, pMicro: Long): (Boolean, Long) = {
    val alpha = math.min(wealth / 10, AlphaMaxMicro)
    if (pMicro <= alpha) (true, wealth - alpha + p.payoutMicro)
    else (false, wealth - alpha * 1000000L / (1000000L - alpha))
  }

  private def update(p: Params)(stream: String, it: Iterator[Test],
      state: GroupState[St]): Iterator[Decision] = {
    var st = state.getOption.getOrElse(St(Long.MinValue, p.w0Micro, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[Decision]
    it.toSeq.sortBy(_.seq).foreach { t =>
      if (t.seq > st.lastSeq) {
        require(t.pMicro >= 0 && t.pMicro <= 1000000L,
          s"pMicro out of [0, 1e6]: ${t.pMicro}")
        val alpha = math.min(st.wealth / 10, AlphaMaxMicro)
        val (rej, w) = step(p, st.wealth, t.pMicro)
        out += Decision(stream, t.seq, t.pMicro, alpha, rej, w)
        st = St(t.seq, w, st.nTests + 1)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Decisions over a (possibly streaming) test frame — one row per
    * consumed test. */
  def monitor(spark: SparkSession, tests: Dataset[Test],
      params: Params = Default): Dataset[Decision] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    tests
      .groupByKey(_.stream)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(params))
  }

  /** Batch reference: the same sequential fold per stream. */
  def reference(tests: Seq[Test],
      params: Params = Default): Seq[Decision] =
    tests.groupBy(_.stream).toSeq.flatMap { case (stream, ts) =>
      var wealth = params.w0Micro
      var last = Long.MinValue
      ts.sortBy(_.seq).flatMap { t =>
        if (t.seq <= last) None
        else {
          val alpha = math.min(wealth / 10, AlphaMaxMicro)
          val (rej, w) = step(params, wealth, t.pMicro)
          wealth = w
          last = t.seq
          Some(Decision(stream, t.seq, t.pMicro, alpha, rej, w))
        }
      }
    }
}
