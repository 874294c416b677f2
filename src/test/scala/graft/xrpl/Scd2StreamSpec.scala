package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Scd2Stream
import graft.streaming.Scd2Stream.{Ev, Segment}

/** The streamed SCD-2 builder must emit exactly the CLOSED intervals of
  * the batch islands construction, for any micro-batching that
  * preserves per-user (us, event_id) order — a segment spanning a
  * micro-batch boundary closes with the right end and count (the open
  * segment carries in state).
  */
class Scd2StreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def mkEvents(): Seq[Ev] = {
    val types = Vector("signup", "click", "click", "view", "purchase")
    val rnd = new scala.util.Random(20260815L)
    (1 to 150).map { i =>
      Ev(user_id = 1L + rnd.nextInt(5), us = i * 1000L, event_id = i.toLong,
        event_type = types(rnd.nextInt(types.size)))
    }
  }

  test("stream equals the reference islands fold across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val events = mkEvents()
    val expected = Scd2Stream.reference(events)
      .sortBy(s => (s.user_id, s.seg))
    assert(expected.size > 50)
    assert(expected.exists(_.n_events > 1),
      "test design: some runs must span multiple events")

    for (splitAt <- Seq(13, 75, 149)) {
      val (b1, b2) = events.splitAt(splitAt)
      val stream = MemoryStream[Ev]
      val q = Scd2Stream.closedSegments(spark, stream.toDS())
        .writeStream.format("memory").queryName("scd2_segs")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("scd2_segs")
          .as[Segment].collect().toSeq
          .sortBy(s => (s.user_id, s.seg))
        assert(got === expected, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("streamed closed set equals the batch gate's closed subset on real events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val dir = "/root/testdata/sf0.001"
    val batchClosed = graft.SparkEntry
      .queries("events_scd2_intervals")(spark, dir)
      .filter(col("end_us").isNotNull)
      .select(col("user_id"), col("seg"), col("event_type"),
        col("start_us"), col("end_us"), col("n_events"))
      .as[Segment].collect().toSet

    val rows = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[Ev].collect().toSeq.sortBy(e => (e.us, e.event_id))
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val stream = MemoryStream[Ev]
    val q = Scd2Stream.closedSegments(spark, stream.toDS())
      .writeStream.format("memory").queryName("scd2_real")
      .outputMode("append").start()
    try {
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("scd2_real").as[Segment].collect().toSet
      assert(streamed === batchClosed)
    } finally q.stop()
  }
}
