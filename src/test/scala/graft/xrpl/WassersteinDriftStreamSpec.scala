package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WassersteinDriftStream
import graft.streaming.WassersteinDriftStream.{CellW, Cells, GridLo, Obs}

/** The bounded-state Wasserstein-drift stream must (1) reproduce the
  * sequential grid fold for ANY micro-batching — cell counts carry
  * across splits — and (2) land within the PROVEN 2·CellW snapping
  * bound of the exact batch `dq_wasserstein_drift` gate on real event
  * data, with the side counts matching the gate exactly.
  */
class WassersteinDriftStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  /** Real tagged observations: the gate's half-split reproduced over
    * the events table (cur = second half by the min+span/2 midpoint,
    * cents = the gate's exact quantization). */
  private def mkObs(dir: String): Seq[Obs] = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mid = {
      val us = ev.map(_._2)
      us.min + (us.max - us.min) / 2
    }
    ev.map { case (s, us, c) => Obs(s, us >= mid, c) }.toSeq
  }

  test("stream equals the reference grid fold across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val obs = mkObs("/root/testdata/sf0.001")
    assert(obs.forall(o =>
      o.cents >= GridLo && o.cents < GridLo + Cells * CellW),
      "test design: the events domain must fit the grid span")

    for (splitAt <- Seq(137, 500, 903)) {
      val expected = WassersteinDriftStream
        .reference(obs, Seq(splitAt))
        .sortBy(p => (p.series, p.n_ref + p.n_cur))
      val (b1, b2) = obs.splitAt(splitAt)
      val stream = MemoryStream[Obs]
      val q = WassersteinDriftStream.monitor(spark, stream.toDS())
        .writeStream.format("memory").queryName("drift_pts")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("drift_pts")
          .as[WassersteinDriftStream.DriftPoint].collect()
          .sortBy(p => (p.series, p.n_ref + p.n_cur)).toSeq
        assert(got == expected, s"split at $splitAt diverged")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS drift_pts")
      }
    }
  }

  test("final emissions sit within the proven 2-cell bound of the batch gate") {
    val dir = "/root/testdata/sf0.001"
    val obs = mkObs(dir)
    val finals = WassersteinDriftStream.reference(obs, Seq.empty)
      .groupBy(_.series).map { case (_, ps) => ps.last }
    val gate = graft.SparkEntry
      .queries("dq_wasserstein_drift")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(gate.size >= 3 && finals.size == gate.size,
      "test design: several series, all with both halves populated")
    val bound = 2L * CellW * 1000000L
    finals.foreach { p =>
      val (nr, nc, exact) = gate(p.series)
      assert(p.n_ref == nr && p.n_cur == nc,
        s"${p.series}: side counts diverge from the gate")
      assert(math.abs(p.emd_grid_microcents - exact) < bound,
        s"${p.series}: |grid ${p.emd_grid_microcents} - exact $exact|" +
          s" >= $bound microcents")
      // the bound must be doing work on real data, not comparing zeros
      assert(exact > bound,
        s"${p.series}: degenerate comparison (exact EMD under the bound)")
      // the bound is VALID here: no observation was clamped
      assert(p.n_clamped == 0L,
        s"${p.series}: events domain should fit the grid span")
    }
  }

  test("n_clamped counts out-of-span mass (bound-voiding alarm)") {
    val hi = GridLo + Cells * CellW // first cents value PAST the span
    val obs = Seq(
      Obs("s", cur = false, GridLo + 5),     // in span
      Obs("s", cur = false, GridLo - 1),     // below → clamped
      Obs("s", cur = true, hi),              // at span end → clamped
      Obs("s", cur = true, hi + 12345),      // far above → clamped
      Obs("s", cur = true, GridLo))          // in span (left edge)
    val pts = WassersteinDriftStream.reference(obs, Seq(2))
    assert(pts.map(_.n_clamped) == Seq(1L, 3L),
      "clamped count must accumulate across micro-batches")
    val fin = pts.last
    assert(fin.n_ref == 2L && fin.n_cur == 3L &&
      fin.emd_grid_microcents >= 0L,
      "clamped rows still land in edge cells (mass is never dropped)")
  }
}
