package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TransitionStream
import graft.streaming.TransitionStream.{Ev, Transition}

/** The streamed per-user transition emitter must reproduce the batch
  * gate's LEAD-window relation for ANY micro-batching that preserves
  * per-user (us, event_id) order — including users whose consecutive
  * events land in different micro-batches (state carries the last
  * event across the split) — and must drop late duplicates of closed
  * positions.
  */
class TransitionStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def mkEvents(): Seq[Ev] = {
    val types = Vector("signup", "click", "view", "purchase", "error")
    val rnd = new scala.util.Random(20260814L)
    (1 to 120).map { i =>
      Ev(user_id = 1L + rnd.nextInt(7), us = i * 1000L, event_id = i.toLong,
        event_type = types(rnd.nextInt(types.size)))
    }
  }

  test("stream equals the reference fold across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val events = mkEvents()
    val expected = TransitionStream.reference(events)
      .sortBy(t => (t.user_id, t.us))
    assert(expected.size > 100)

    for (splitAt <- Seq(11, 60, 119)) {
      val (b1, b2) = events.splitAt(splitAt)
      val stream = MemoryStream[Ev]
      val q = TransitionStream.transitions(spark, stream.toDS())
        .writeStream.format("memory").queryName("trans_pts")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("trans_pts")
          .as[Transition].collect().toSeq
          .sortBy(t => (t.user_id, t.us))
        assert(got === expected, s"splitAt=$splitAt")
      } finally q.stop()
    }
  }

  test("late duplicates of closed positions are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val events = mkEvents().filter(_.user_id == 1L)
    val expected = TransitionStream.reference(events)
      .sortBy(_.us)

    val stream = MemoryStream[Ev]
    val q = TransitionStream.transitions(spark, stream.toDS())
      .writeStream.format("memory").queryName("trans_dup")
      .outputMode("append").start()
    try {
      val (b1, b2) = events.splitAt(5)
      stream.addData(b1)
      q.processAllAvailable()
      // replay an already-consumed position with a different type: no
      // output row, no state change
      stream.addData(Seq(b1.head.copy(event_type = "error")))
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      val got = spark.table("trans_dup")
        .as[Transition].collect().toSeq.sortBy(_.us)
      assert(got === expected)
    } finally q.stop()
  }

  test("streamed counts equal the batch gate's transition matrix on real events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))

    // the batch gate's relation: LEAD over (us, event_id) per user
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val batch = ev
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .as[(String, String, Long)].collect().toSet

    // stream the same events in global-ts order, split mid-run
    // (global order implies per-user order)
    val rows = ev.as[Ev].collect().toSeq.sortBy(e => (e.us, e.event_id))
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val stream = MemoryStream[Ev]
    val q = TransitionStream.transitions(spark, stream.toDS())
      .writeStream.format("memory").queryName("trans_real")
      .outputMode("append").start()
    try {
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("trans_real").as[Transition]
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
        .as[(String, String, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
