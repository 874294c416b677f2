package graft.xrpl

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.WassersteinDriftStream
import graft.streaming.WassersteinDriftStream.{CellW, Cells, GridLo, Obs}

/** Property tests for the bounded-state Wasserstein drift fold
  * (no Spark session — the pure reference fold and its proven bound):
  *
  *  1. batching invariance: the sequential grid fold's FINAL per-series
  *     point is identical for any micro-batch split of the same
  *     observation stream (the property the Spark stream inherits and
  *     WassersteinDriftStreamSpec pins end-to-end);
  *  2. the snapping bound: |grid-EMD − exact-EMD| < 2·CellW holds for
  *     arbitrary in-span distributions, where exact-EMD is an
  *     independent O(V) CDF-walk over the raw (un-snapped) values —
  *     the triangle-inequality proof, checked empirically.
  */
object WassersteinGridProps extends Properties("WassersteinGrid") {

  // observation streams: clustered cents values (ties + spread), both
  // sides non-empty, within the grid span
  private val centsGen: Gen[Long] = Gen.frequency(
    (4, Gen.choose(0L, 2000L)),
    (2, Gen.choose(30000L, 33000L)),
    (1, Gen.choose(0L, GridLo + Cells * CellW - 1)))
  private val obsGen: Gen[List[Obs]] = for {
    nRef <- Gen.chooseNum(1, 120)
    nCur <- Gen.chooseNum(1, 120)
    ref <- Gen.listOfN(nRef, centsGen)
    cur <- Gen.listOfN(nCur, centsGen)
  } yield ref.map(Obs("s", cur = false, _)) ++
    cur.map(Obs("s", cur = true, _))

  property("final point is invariant to micro-batch splits") =
    forAll(obsGen, Gen.chooseNum(0, 200), Gen.chooseNum(0, 200)) {
      (obs, a, b) =>
        def fin(splits: Seq[Int]) =
          WassersteinDriftStream.reference(obs, splits).last
        fin(Nil) == fin(Seq(a)) && fin(Nil) == fin(Seq(a, b))
    }

  /** Exact 1-D point-mass EMD over raw values: Σ (v_{i+1}−v_i)·
    * |F_ref(v_i) − F_cur(v_i)|, as a double (n·m ≤ 14400 here, no
    * precision concerns at test sizes). */
  private def exactEmd(obs: Seq[Obs]): Double = {
    val ref = obs.filter(!_.cur).map(_.cents)
    val cur = obs.filter(_.cur).map(_.cents)
    val (n, m) = (ref.size.toDouble, cur.size.toDouble)
    val vs = (ref ++ cur).distinct.sorted
    vs.zip(vs.tail).map { case (v, nv) =>
      val gap = ref.count(_ <= v) / n - cur.count(_ <= v) / m
      (nv - v) * math.abs(gap)
    }.sum
  }

  property("grid EMD sits within the proven 2-cell snapping bound") =
    forAll(obsGen) { obs =>
      val grid = WassersteinDriftStream.reference(obs, Nil)
        .last.emd_grid_microcents / 1e6
      math.abs(grid - exactEmd(obs)) < 2.0 * CellW
    }
}
