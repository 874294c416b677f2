package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SprtStream
import graft.streaming.SprtStream.Bucket

/** The streamed SPRT monitor must reproduce the sequential latching
  * fold for ANY micro-batching — including a split straight through
  * the decision point (the latch must carry across batches: no rows
  * after the crossing, however the buckets arrive), and late
  * duplicates of closed cohorts must drop.
  */
class SprtStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  // H0: 40% vs H1: 50%, α = 0.05, β = 0.2 — the batch gate's design
  private val params = SprtStream.design(0.4, 0.5, 0.05, 0.2)

  private def mkBuckets(): Seq[Bucket] = {
    val rnd = new scala.util.Random(20260815L)
    // 'hot' converts ~55%: must reject H0 and stop well before day 40
    val hot = (1 to 40).map { d =>
      val t = 20 + rnd.nextInt(10)
      Bucket("hot", d.toLong, t.toLong,
        (0 until t).count(_ => rnd.nextDouble() < 0.55).toLong)
    }
    // 'cold' converts ~30%: must accept H0 and stop
    val cold = (1 to 40).map { d =>
      val t = 20 + rnd.nextInt(10)
      Bucket("cold", d.toLong, t.toLong,
        (0 until t).count(_ => rnd.nextDouble() < 0.30).toLong)
    }
    // 'mid' converts ~45% with few, noisy cohorts: may or may not
    // decide — whatever the reference fold says, the stream must match
    val mid = (1 to 6).map { d =>
      val t = 3 + rnd.nextInt(3)
      Bucket("mid", d.toLong, t.toLong,
        (0 until t).count(_ => rnd.nextDouble() < 0.45).toLong)
    }
    hot ++ cold ++ mid
  }

  test("stream equals the latching reference across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets()
    val expected = SprtStream.reference(buckets, params)
      .sortBy(p => (p.experiment, p.epoch))
    // test design: both boundaries actually latch, early
    assert(expected.filter(_.experiment == "hot")
      .lastOption.exists(_.decision == "reject_h0"))
    assert(expected.filter(_.experiment == "cold")
      .lastOption.exists(_.decision == "accept_h0"))
    assert(expected.count(_.experiment == "hot") < 40,
      "hot must STOP before consuming every bucket")

    for (splitAt <- Seq(3, 11, 45)) {
      val (b1, b2) = buckets.splitAt(splitAt)
      val stream = MemoryStream[Bucket]
      val q = SprtStream.monitor(spark, stream.toDS(), params)
        .writeStream.format("memory").queryName("sprt_pts")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("sprt_pts")
          .as[SprtStream.SprtPoint].collect().toSeq
          .sortBy(p => (p.experiment, p.epoch))
        assert(got === expected, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("decision latch survives a restart-shaped replay of later buckets") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets().filter(_.experiment == "hot")
    val expected = SprtStream.reference(buckets, params)
    val decidedAt = expected.last.epoch

    val stream = MemoryStream[Bucket]
    val q = SprtStream.monitor(spark, stream.toDS(), params)
      .writeStream.format("memory").queryName("sprt_latch")
      .outputMode("append").start()
    try {
      stream.addData(buckets)
      q.processAllAvailable()
      // a late duplicate of a closed cohort AND fresh post-decision
      // buckets: neither may emit (the trial is over)
      stream.addData(Seq(
        Bucket("hot", decidedAt, 999L, 999L),
        Bucket("hot", decidedAt + 100, 50L, 49L)))
      q.processAllAvailable()
      val got = spark.table("sprt_latch")
        .as[SprtStream.SprtPoint].collect().toSeq
        .sortBy(_.epoch)
      assert(got === expected)
    } finally q.stop()
  }

  test("micro-quantized constants match the batch gate's oracle form") {
    // the stream's design constants must be the batch gate's micro
    // literals (ln quantized DECIMAL(18,6) half-up ×1e6)
    assert(params.lnAMicro == 223144L)   // ln(1.25)
    assert(params.lnBMicro == -182322L)  // ln(5/6)
    assert(params.upperMicro == 2772589L)  // ln(16)
    assert(params.lowerMicro == -1558145L) // ln(4/19)
  }
}
