package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CaptureRecaptureStream
import graft.streaming.CaptureRecaptureStream.Arrival

/** The streamed capture–recapture estimator must reproduce the
  * per-epoch reference fold for ANY micro-batching, converge toward
  * the true population as coverage grows, and match the batch gate's
  * engine-portable md5 draws exactly.
  */
class CaptureRecaptureStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def mkArrivals(): Seq[Arrival] = {
    // 2000 distinct keys arriving over 10 epochs, interleaved with a
    // second sparse series
    // epochs non-decreasing in arrival order (the monitor's contract:
    // closed cohorts arrive in order per series)
    val keys = (0 until 2000).map(_ * 37L + 5)
    val main = keys.zipWithIndex.map { case (k, i) =>
      Arrival("pop", (i / 200).toLong + 1, k)
    }
    val side = (0 until 60).map(i =>
      Arrival("side", (i / 15).toLong + 1, i * 101L))
    main ++ side
  }

  test("stream equals the per-epoch reference across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val arrivals = mkArrivals()
    val expected = CaptureRecaptureStream.reference(arrivals)
      .sortBy(p => (p.series, p.epoch))
    // estimator sanity at full coverage: within 35% of the truth
    val fin = expected.filter(_.series == "pop").maxBy(_.epoch)
    assert(fin.nTrue == 2000)
    assert(math.abs(fin.chapmanEst - 2000) <= 700,
      s"estimate ${fin.chapmanEst} wildly off 2000")

    // splits aligned to closed-cohort boundaries (a cohort ships whole)
    for (splitAt <- Seq(200, 1000, 2030)) {
      val (a1, a2) = arrivals.splitAt(splitAt)
      val stream = MemoryStream[Arrival]
      val q = CaptureRecaptureStream.monitor(spark, stream.toDS())
        .writeStream.format("memory").queryName("cr_pts")
        .outputMode("append").start()
      try {
        stream.addData(a1)
        q.processAllAvailable()
        stream.addData(a2)
        q.processAllAvailable()
        val got = spark.table("cr_pts")
          .as[CaptureRecaptureStream.CrPoint].collect().toSeq
          .sortBy(p => (p.series, p.epoch))
        assert(got === expected, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("hash draws match the batch gate's DuckDB formulation") {
    // CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || ':crA'), 1, 13))
    //   AS BIGINT) — spot-pin a few keys against an independent
    // computation of the same md5 prefix
    for (k <- Seq(0L, 13L, 999983L)) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$k:crA".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(CaptureRecaptureStream.hash52(k, ":crA") ==
        java.lang.Long.parseLong(hex.take(13), 16))
    }
    // and the sampling rate is in the right ballpark (25% ± 5pp over
    // 4000 keys)
    val n = (0 until 4000)
      .count(i => CaptureRecaptureStream.inA(i.toLong * 7 + 3))
    assert(n > 800 && n < 1200, s"sample rate off: $n/4000")
  }

  test("chapman survives the Long-overflow boundary of (nA+1)*(nB+1)") {
    import CaptureRecaptureStream.chapman
    // at the 25% sample rate a population near 1.2e10 puts the
    // numerator right at 2^63 — a Long multiply wraps negative there
    val nA = 3037000500L // ceil(sqrt(2^63)) — (nA+1)^2 > Long.MaxValue
    assert((nA + 1) * (nA + 1) < 0, "boundary no longer overflows Long")
    val est = chapman(nA, nA, nA / 4)
    val exact = ((BigInt(nA) + 1) * (BigInt(nA) + 1) / (nA / 4 + 1)) - 1
    assert(est == exact.toLong && est > 0,
      s"overflow-boundary estimate wrong: $est vs $exact")
    // and small values are unchanged (floorDiv ≡ BigInt truncation on
    // nonnegatives)
    assert(chapman(10, 20, 4) == Math.floorDiv(11L * 21L, 5L) - 1)
    assert(chapman(0, 0, 0) == 0)
  }
}
