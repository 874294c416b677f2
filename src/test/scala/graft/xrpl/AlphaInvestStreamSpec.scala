package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AlphaInvestStream
import graft.streaming.AlphaInvestStream.{Params, Test}

/** The streamed alpha-investing monitor must reproduce the sequential
  * wealth fold for ANY micro-batching, drop duplicate sequence
  * numbers, and show the two behaviors the mechanic exists for: a
  * discovery-rich stream keeps its wealth (keeps testing at
  * meaningful levels), a null stream spends itself quiet.
  */
class AlphaInvestStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def mkTests(): Seq[Test] = {
    val rnd = new scala.util.Random(20260815L)
    // 'nulls': uniform p-values — a few early false rejections are
    // possible but wealth must drain and rejections stop
    val nulls = (1 to 60).map(i =>
      Test("nulls", i.toLong, 1000L + rnd.nextInt(999000)))
    // 'signal': every third test is a strong discovery (tiny p)
    val signal = (1 to 60).map(i =>
      Test("signal", i.toLong,
        if (i % 3 == 0) rnd.nextInt(400).toLong
        else 1000L + rnd.nextInt(999000)))
    nulls ++ signal
  }

  test("stream equals the sequential reference across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val tests = mkTests()
    val expected = AlphaInvestStream.reference(tests)
      .sortBy(d => (d.stream, d.seq))

    // test-design sanity: the signal stream rejects much more and
    // retains wealth; the null stream goes quiet in its second half
    val bySt = expected.groupBy(_.stream)
    val sigRej = bySt("signal").count(_.reject)
    val nullRejLate = bySt("nulls").filter(_.seq > 30).count(_.reject)
    assert(sigRej >= 10, s"signal stream rejected only $sigRej")
    assert(nullRejLate == 0,
      s"null stream still rejecting late: $nullRejLate")
    assert(bySt("signal").last.wealthMicro >
      bySt("nulls").last.wealthMicro * 10)

    for (splitAt <- Seq(7, 60, 100)) {
      val (a, b) = tests.splitAt(splitAt)
      val stream = MemoryStream[Test]
      val q = AlphaInvestStream.monitor(spark, stream.toDS())
        .writeStream.format("memory").queryName("ai_pts")
        .outputMode("append").start()
      try {
        stream.addData(a)
        q.processAllAvailable()
        stream.addData(b)
        q.processAllAvailable()
        val got = spark.table("ai_pts")
          .as[AlphaInvestStream.Decision].collect().toSeq
          .sortBy(d => (d.stream, d.seq))
        assert(got === expected, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("wealth accounting is exact and never negative") {
    // independent re-derivation of the fold on a hostile sequence:
    // alternating strong discoveries and sure-losses
    val p = Params(50000L, 50000L)
    var w = p.w0Micro
    for (i <- 1 to 2000) {
      val pm = if (i % 2 == 0) 0L else 1000000L
      val alpha = math.min(w / 10, AlphaInvestStream.AlphaMaxMicro)
      val (rej, w2) = AlphaInvestStream.step(p, w, pm)
      if (pm == 0L) {
        assert(rej && w2 == w - alpha + p.payoutMicro)
      } else {
        // sure loss: charge is floor(alpha/(1 - alpha)) in micro
        val charge =
          (BigInt(alpha) * 1000000 / (1000000 - alpha)).toLong
        assert(!rej && w2 == w - charge)
      }
      assert(w2 >= 0, s"wealth went negative at step $i: $w2")
      // the bid cap must hold no matter how rich the stream gets —
      // an uncapped alpha crossing 1e6 would flip the charge sign
      assert(alpha <= AlphaInvestStream.AlphaMaxMicro)
      w = w2
    }
    // a rejection at zero-bid wealth is impossible: p <= alpha = 0
    // only for p = 0, which still pays out — pin the boundary
    val (rejAt0, wAt0) = AlphaInvestStream.step(p, 9L, 0L)
    assert(rejAt0 && wAt0 == 9L + p.payoutMicro)
    val (rejTiny, _) = AlphaInvestStream.step(p, 9L, 1L)
    assert(!rejTiny)
  }

  test("duplicate sequence numbers are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val tests = mkTests().filter(_.stream == "signal")
    val expected = AlphaInvestStream.reference(tests).sortBy(_.seq)

    val stream = MemoryStream[Test]
    val q = AlphaInvestStream.monitor(spark, stream.toDS())
      .writeStream.format("memory").queryName("ai_dup")
      .outputMode("append").start()
    try {
      stream.addData(tests.take(20))
      q.processAllAvailable()
      stream.addData(Seq(Test("signal", 5L, 0L))) // stale duplicate
      q.processAllAvailable()
      stream.addData(tests.drop(20))
      q.processAllAvailable()
      val got = spark.table("ai_dup")
        .as[AlphaInvestStream.Decision].collect().toSeq.sortBy(_.seq)
      assert(got === expected)
    } finally q.stop()
  }
}
