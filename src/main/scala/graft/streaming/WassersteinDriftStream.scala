package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Bounded-state streaming twin of the `dq_wasserstein_drift` gate
  * (VERDICT r13 #6).
  *
  * The batch gate is binning-free: it folds a per-DISTINCT-cents-value
  * histogram, so its exact incremental form needs keyed state
  * proportional to the live value domain — unbounded in general. The
  * deployable stream instead maintains a FIXED cents-grid per series
  * ([[Cells]] cells of width [[CellW]] cents from [[GridLo]]): each
  * observation snaps to its cell's left edge, and the emitted distance
  * is the EXACT point-mass EMD of the two snapped distributions
  * (uniform-grid prefix sums — including empty cells changes nothing,
  * F is constant across them and k·w·|gap| telescopes to
  * (v_next−v)·|gap|).
  *
  * PROVEN error bound vs the batch gate (asserted on real data by
  * WassersteinDriftStreamSpec): snapping moves every point mass by
  * less than one cell width w, so EMD(P, P̃) < w and EMD(Q, Q̃) < w;
  * by the triangle inequality on the Wasserstein metric
  * |EMD(P̃, Q̃) − EMD(P, Q)| ≤ EMD(P, P̃) + EMD(Q, Q̃) < 2w
  * — i.e. the streamed figure sits within 2·[[CellW]] cents
  * (2·CellW·10⁶ microcents) of the gate's exact value, for any data
  * inside the grid span. Values outside [GridLo, GridLo + Cells·w)
  * clamp to the edge cells, which voids the bound for the clamped
  * mass — that mass is EXPOSED as [[DriftPoint.n_clamped]] so a
  * deployment alarms (and resizes the span — a constant change)
  * instead of trusting a silently degraded figure; the spec asserts
  * n_clamped = 0 on the events domain and > 0 on an out-of-span
  * series.
  *
  * Scale design: state is 2·[[Cells]] longs per series (32 KiB at the
  * defaults) — series-count-bounded, independent of rows and of the
  * value domain's cardinality. Arrival order is irrelevant (counts
  * commute), so unlike the day-bucket twins there is no late-row
  * drop: the twin assumes the source's exactly-once replay contract
  * (checkpointed offsets; a duplicate OBSERVATION would double-count,
  * where a duplicate day-bucket is detectable by key).
  *
  * Ref/cur tagging: in deployment `cur = false` loads the frozen
  * reference window (e.g. training-time distribution) and
  * `cur = true` streams the live window — the gate's half-split is
  * one particular tagging, which the spec reproduces for parity.
  */
object WassersteinDriftStream {

  /** Grid origin in cents. */
  val GridLo = 0L
  /** Cell width in cents — the error bound is 2·CellW cents. */
  val CellW = 32L
  /** Cell count: span = Cells·CellW = 65 536 cents at the defaults. */
  val Cells = 2048

  /** One tagged observation: `cur` = live-window side, cents = the
    * gate's exact integer quantization of `value`. */
  final case class Obs(series: String, cur: Boolean, cents: Long)

  /** Per-series drift readout after a micro-batch: exact snapped-EMD
    * in microcents, −1 while either side is still empty (the batch
    * gate's NULL). `n_clamped` counts observations (both sides,
    * cumulative) whose cents fell OUTSIDE [GridLo, GridLo + Cells·w)
    * and were clamped to an edge cell — for that mass the 2·CellW
    * error bound is VOID, so a deployment alarms on n_clamped > 0
    * (and resizes the span) rather than trusting a silently degraded
    * figure. */
  final case class DriftPoint(series: String, n_ref: Long, n_cur: Long,
      emd_grid_microcents: Long, n_clamped: Long)

  /** Keyed state: two fixed-width cell-count vectors plus the
    * cumulative out-of-span (bound-voiding) observation count. */
  final case class St(ref: Array[Long], cur: Array[Long],
      clamped: Long)

  // direct bound test, NOT via the cell division: JVM `/` truncates
  // toward zero, so (cents − GridLo)/CellW is 0 for the whole open
  // interval (GridLo − CellW, GridLo) and a division-based test would
  // misread just-below-span values as in-span
  private def inSpan(cents: Long): Boolean =
    cents >= GridLo && cents < GridLo + Cells * CellW

  private def cellOf(cents: Long): Int = {
    val c = (cents - GridLo) / CellW
    if (c < 0) 0 else if (c >= Cells) Cells - 1 else c.toInt
  }

  /** Exact point-mass EMD of the snapped distributions, in
    * microcents: Σ_cells w·|cumr·ncur − cumc·nref|·10⁶ // (nref·ncur),
    * folded in BigInt (cum·n products exceed int64 past ~3·10⁹-row
    * series) with ONE truncating division at the end — the batch
    * gate's DECIMAL(38,0) spelling. */
  private def emdMicro(ref: Array[Long], cur: Array[Long]): Long = {
    var nref = BigInt(0); var ncur = BigInt(0)
    var i = 0
    while (i < Cells) { nref += ref(i); ncur += cur(i); i += 1 }
    if (nref == 0 || ncur == 0) return -1L
    var cumr = BigInt(0); var cumc = BigInt(0); var s = BigInt(0)
    i = 0
    while (i < Cells - 1) { // last cell's gap has no next value
      cumr += ref(i); cumc += cur(i)
      s += (cumr * ncur - cumc * nref).abs
      i += 1
    }
    (s * CellW * 1000000 / (nref * ncur)).toLong
  }

  private def update(series: String, it: Iterator[Obs],
      state: GroupState[St]): Iterator[DriftPoint] = {
    val st0 = state.getOption.getOrElse(
      St(new Array[Long](Cells), new Array[Long](Cells), 0L))
    var any = false
    var clamped = st0.clamped
    it.foreach { o =>
      any = true
      val c = cellOf(o.cents)
      if (!inSpan(o.cents)) clamped += 1
      if (o.cur) st0.cur(c) += 1 else st0.ref(c) += 1
    }
    val st = st0.copy(clamped = clamped)
    state.update(st)
    if (!any) Iterator.empty
    else Iterator.single(DriftPoint(series,
      st.ref.sum, st.cur.sum, emdMicro(st.ref, st.cur), st.clamped))
  }

  /** Drift points over a (possibly streaming) observation frame; one
    * output row per (series, micro-batch-with-data),
    * Append-compatible. */
  def monitor(spark: SparkSession, obs: Dataset[Obs])
      : Dataset[DriftPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    obs
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch reference: the same grid fold as a sequential pass over
    * micro-batch splits — what [[monitor]] must reproduce for any
    * batching. `splits` gives the batch sizes in arrival order. */
  def reference(obs: Seq[Obs], splits: Seq[Int]): Seq[DriftPoint] = {
    val st = scala.collection.mutable.Map.empty[String, St]
    val out = scala.collection.mutable.ArrayBuffer.empty[DriftPoint]
    var rest = obs
    val sizes = splits :+ Int.MaxValue
    sizes.foreach { n =>
      val (batch, tail) = rest.splitAt(n)
      rest = tail
      batch.groupBy(_.series).toSeq.sortBy(_._1).foreach {
        case (series, os) =>
          val s0 = st.getOrElseUpdate(series,
            St(new Array[Long](Cells), new Array[Long](Cells), 0L))
          var clamped = s0.clamped
          os.foreach { o =>
            val c = cellOf(o.cents)
            if (!inSpan(o.cents)) clamped += 1
            if (o.cur) s0.cur(c) += 1 else s0.ref(c) += 1
          }
          val s = s0.copy(clamped = clamped)
          st(series) = s
          out += DriftPoint(series, s.ref.sum, s.cur.sum,
            emdMicro(s.ref, s.cur), s.clamped)
      }
    }
    out.toSeq
  }
}
