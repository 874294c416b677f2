package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CusumStream
import graft.streaming.CusumStream.{Bucket, Params}

/** The streamed CUSUM monitor must reproduce the sequential reference
  * recursion for ANY micro-batching of the bucket stream — including a
  * series split mid-run (state carries across batches) and a late
  * duplicate of a closed bucket (dropped, not double-counted).
  */
class CusumStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val params = Map(
    "click" -> Params(mu = 70, kappa = 5, h = 40))
  private val default = Params(mu = 60, kappa = 5, h = 40)

  private def mkBuckets(): Seq[Bucket] = {
    val rnd = new scala.util.Random(20260813L)
    val steady = (1 to 20).map(d =>
      Bucket("click", d.toLong, 70L + rnd.nextInt(11) - 5))
    // sustained upward shift past day 20 — the alarm must latch
    val shifted = (21 to 30).map(d =>
      Bucket("click", d.toLong, 85L + rnd.nextInt(11) - 5))
    val other = (1 to 25).map(d =>
      Bucket("view", d.toLong, 60L + rnd.nextInt(11) - 5))
    steady ++ shifted ++ other
  }

  test("stream equals the reference fold across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets()
    val expected = CusumStream
      .reference(buckets, params, default)
      .sortBy(p => (p.series, p.epoch))
    assert(expected.exists(_.alarm), "test design: the shift must alarm")
    assert(expected.count(!_.alarm) > 10)

    for (splitAt <- Seq(7, 23, 40)) {
      val (b1, b2) = buckets.splitAt(splitAt)
      val stream = MemoryStream[Bucket]
      val q = CusumStream.monitor(spark, stream.toDS(), params, default)
        .writeStream.format("memory").queryName("cusum_pts")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("cusum_pts")
          .as[CusumStream.CusumPoint].collect().toSeq
          .sortBy(p => (p.series, p.epoch))
        assert(got === expected, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("late duplicates of closed buckets are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets().filter(_.series == "click")
    val expected = CusumStream.reference(buckets, params, default)
      .sortBy(_.epoch)

    val stream = MemoryStream[Bucket]
    val q = CusumStream.monitor(spark, stream.toDS(), params, default)
      .writeStream.format("memory").queryName("cusum_dup")
      .outputMode("append").start()
    try {
      stream.addData(buckets.take(10))
      q.processAllAvailable()
      // replay an already-consumed bucket with a different value: no
      // output row, no state change
      stream.addData(Seq(Bucket("click", 5L, 999L)))
      q.processAllAvailable()
      stream.addData(buckets.drop(10))
      q.processAllAvailable()
      val got = spark.table("cusum_dup")
        .as[CusumStream.CusumPoint].collect().toSeq.sortBy(_.epoch)
      assert(got === expected)
    } finally q.stop()
  }
}
