package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PsiStream
import graft.streaming.PsiStream.{Params, Slice}

/** The streamed PSI monitor must reproduce the sequential cumulative
  * fold for ANY micro-batching, drop late duplicates of closed days,
  * and actually ALARM when the live distribution drifts off the
  * reference while staying quiet on a faithful stream.
  */
class PsiStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val B = 8
  // reference: geometric-ish mass over 8 buckets
  private val params = Params(
    ref = Seq(400L, 300L, 150L, 80L, 40L, 20L, 7L, 3L),
    thresholdMicro = 200000L)

  private def mkSlices(): Seq[Slice] = {
    val rnd = new scala.util.Random(20260815L)
    def noisy(base: Seq[Long]) =
      base.map(c => math.max(0L, c + rnd.nextInt(5) - 2))
    // 'steady' resamples the reference shape (scaled down 10x)
    val refDaily = params.ref.map(_ / 10)
    val steady = (1 to 25).map(d =>
      Slice("steady", d.toLong, noisy(refDaily)))
    // 'shifted' starts faithful then the mass moves to the tail
    val tailDaily = Seq(3L, 7L, 20L, 40L, 80L, 150L, 300L, 400L)
      .map(_ / 10)
    val shifted = (1 to 10).map(d =>
        Slice("shifted", d.toLong, noisy(refDaily))) ++
      (11 to 25).map(d => Slice("shifted", d.toLong, noisy(tailDaily)))
    steady ++ shifted
  }

  test("stream equals the cumulative reference across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val slices = mkSlices()
    val expected = PsiStream.reference(slices, params)
      .sortBy(p => (p.series, p.epoch))
    // test design: the shifted series must alarm, the steady must not
    assert(expected.filter(_.series == "shifted").exists(_.drifted))
    assert(!expected.filter(_.series == "steady").exists(_.drifted))

    for (splitAt <- Seq(5, 30, 48)) {
      val (s1, s2) = slices.splitAt(splitAt)
      val stream = MemoryStream[Slice]
      val q = PsiStream.monitor(spark, stream.toDS(), params)
        .writeStream.format("memory").queryName("psi_pts")
        .outputMode("append").start()
      try {
        stream.addData(s1)
        q.processAllAvailable()
        stream.addData(s2)
        q.processAllAvailable()
        val got = spark.table("psi_pts")
          .as[PsiStream.PsiPoint].collect().toSeq
          .sortBy(p => (p.series, p.epoch))
        assert(got === expected, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("psiMicro matches the textbook double formula") {
    // absolute pin, independent of the fold: PSI = Σ (pc − pr)·ln(pc/pr)
    // with Laplace(+1) smoothing — the integer micro result must sit
    // within quantization distance (B terms × 1 micro each + the
    // final floor) of the double computation
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 50) {
      val ref = Seq.fill(B)(rnd.nextInt(500).toLong)
      val cum = Seq.fill(B)(rnd.nextInt(500).toLong)
      val p = Params(ref, 200000L)
      val nRef = ref.sum + B
      val nCur = cum.sum + B
      val expect = (0 until B).map { i =>
        val pr = (ref(i) + 1).toDouble / nRef
        val pc = (cum(i) + 1).toDouble / nCur
        (pc - pr) * math.log(pc / pr)
      }.sum * 1e6
      val got = PsiStream.psiMicro(p, cum).toDouble
      assert(math.abs(got - expect) <= B + 1,
        s"ref=$ref cum=$cum got=$got expect=$expect")
    }
  }

  test("psiMicro is exact past the Long-overflow boundary") {
    // cumulative live counts in the millions against a skewed
    // reference: num ≈ cum·(nRef+B) ≈ 4e6·1e3 = 4e9, times
    // lnm ≈ 7e6 micro-nats ≈ 3e16 per term — 8 such terms of mixed
    // sign plus the divisor (nRef+B)·(nCur+B) kept a Long fold
    // honest, but ONE hot bucket at 2e9 cumulative (nRef 1e6) puts
    // num·lnm ≈ 2e15·1.4e7 ≈ 3e22 ≫ 2^63: the old Long accumulator
    // wrapped. Pin against an independent BigDecimal computation.
    val ref = Seq(500000L, 300000L, 150000L, 40000L, 7000L, 2000L,
      700L, 300L)
    val hot = Seq(1000L, 2000L, 3000L, 5000L, 10000L, 50000L,
      400000000L, 1600000000L)
    val p = Params(ref, 200000L)
    val got = PsiStream.psiMicro(p, hot)
    // independent recomputation: exact integer cross-products in
    // BigInt, same micro-quantized ln
    val nRef = ref.sum + 8
    val nCur = hot.sum + 8
    val acc = (0 until 8).map { i =>
      val crL = ref(i) + 1
      val ccL = hot(i) + 1
      val num = BigInt(ccL) * nRef - BigInt(crL) * nCur
      // IMPORTANT: identical double-expression SHAPE to psiMicro's
      // (cc.toDouble * nRef / (cr.toDouble * nCur)) — a different
      // association can differ by 1 ulp, which the micro-quantized
      // log can turn into a ±1 lnm disagreement.
      val lnm = graft.streaming.SprtStream.mlnMicro(
        ccL.toDouble * nRef / (crL.toDouble * nCur))
      num * lnm
    }.sum
    val den = BigInt(nRef) * nCur
    val expect = (acc - (((acc % den) + den) % den)) / den // floor div
    assert(got == expect.toLong, s"got $got expect $expect")
    // sanity: a drift this extreme is far past any alarm threshold
    assert(got > p.thresholdMicro)
    // and the double formula agrees to quantization distance
    val dbl = (0 until 8).map { i =>
      val pr = (ref(i) + 1).toDouble / nRef
      val pc = (hot(i) + 1).toDouble / nCur
      (pc - pr) * math.log(pc / pr)
    }.sum * 1e6
    assert(math.abs(got - dbl) <= 9, s"got $got dbl $dbl")
  }

  test("late duplicates of closed days are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val slices = mkSlices().filter(_.series == "steady")
    val expected = PsiStream.reference(slices, params)
      .sortBy(_.epoch)

    val stream = MemoryStream[Slice]
    val q = PsiStream.monitor(spark, stream.toDS(), params)
      .writeStream.format("memory").queryName("psi_dup")
      .outputMode("append").start()
    try {
      stream.addData(slices.take(8))
      q.processAllAvailable()
      stream.addData(Seq(Slice("steady", 3L, Seq.fill(B)(999L))))
      q.processAllAvailable()
      stream.addData(slices.drop(8))
      q.processAllAvailable()
      val got = spark.table("psi_dup")
        .as[PsiStream.PsiPoint].collect().toSeq.sortBy(_.epoch)
      assert(got === expected)
    } finally q.stop()
  }
}
