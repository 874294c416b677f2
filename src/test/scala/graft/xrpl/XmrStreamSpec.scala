package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.XmrStream
import graft.streaming.XmrStream.{Bucket, Params}

/** The streamed XmR monitor must reproduce the sequential grading
  * fold for ANY micro-batching — the 8-point run rule's counter must
  * carry across batch boundaries — and drop late duplicates.
  */
class XmrStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  // calibrated: μ = 100, M̄R = 6 (×100 design integers)
  private val params = Params(mu100 = 10000L, mrbar100 = 600L)

  private def mkBuckets(): Seq[Bucket] = {
    val rnd = new scala.util.Random(20260815L)
    // in-control noise, then a small sustained +4 shift (inside the
    // bands — only the run rule can catch it), then one 3σ spike
    val steady = (1 to 12).map(d =>
      Bucket("m", d.toLong, 100L + rnd.nextInt(7) - 3))
    val shift = (13 to 24).map(d =>
      Bucket("m", d.toLong, 104L + rnd.nextInt(3) - 1))
    val spike = Seq(Bucket("m", 25L, 130L))
    steady ++ shift ++ spike
  }

  test("stream equals the grading fold; run rule spans batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets()
    val expected = XmrStream.reference(buckets, params)
      .sortBy(_.epoch)
    // test design: the shift trips the RUN rule (not the bands), the
    // spike trips 3σ
    assert(expected.exists(_.runAlarm))
    assert(expected.filter(_.runAlarm).forall(_.zone != "beyond_3sigma")
      || expected.last.zone == "beyond_3sigma")
    assert(expected.last.zone == "beyond_3sigma")

    // split INSIDE the run (epoch 13..24) so the counter must carry
    for (splitAt <- Seq(5, 17, 24)) {
      val (b1, b2) = buckets.splitAt(splitAt)
      val stream = MemoryStream[Bucket]
      val q = XmrStream.monitor(spark, stream.toDS(), params)
        .writeStream.format("memory").queryName("xmr_pts")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("xmr_pts")
          .as[XmrStream.XmrPoint].collect().toSeq.sortBy(_.epoch)
        assert(got === expected, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("late duplicates of closed buckets are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets()
    val expected = XmrStream.reference(buckets, params)
      .sortBy(_.epoch)

    val stream = MemoryStream[Bucket]
    val q = XmrStream.monitor(spark, stream.toDS(), params)
      .writeStream.format("memory").queryName("xmr_dup")
      .outputMode("append").start()
    try {
      stream.addData(buckets.take(15))
      q.processAllAvailable()
      stream.addData(Seq(Bucket("m", 9L, 999L)))
      q.processAllAvailable()
      stream.addData(buckets.drop(15))
      q.processAllAvailable()
      val got = spark.table("xmr_dup")
        .as[XmrStream.XmrPoint].collect().toSeq.sortBy(_.epoch)
      assert(got === expected)
    } finally q.stop()
  }
}
