package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionStream

/** MemoryStream element for [[SessionStreamSpec]] (top-level so the
  * case-class encoder derives without an outer pointer). */
case class SessionEv(user_id: Long, event_type: String, us: Long)

/** Streaming session_window sessionization must produce exactly the
  * sessions of the batch lag/cumsum formulation (the
  * sessionize_events gate) on the same events, including sessions
  * whose events span a micro-batch boundary.
  */
class SessionStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"
  private val gapUs = 14400000000L // 4 hours
  private type Ev = SessionEv
  private val Ev = SessionEv

  test("streaming sessions equal the batch sessionization") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

    // batch expectation: gap-split sessions via lag/cumsum, reduced to
    // the streaming operator's (user, start, end, counts) shape
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = ev
      .withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("sess", sum(col("new_s")).over(wc))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("long").as("n_purchase"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("n_purchase"))
      .collect().toSet

    // stream the same events in time order, split mid-timeline so
    // sessions straddle the micro-batch boundary; a far-future
    // sentinel then pushes the watermark past every real session
    val all = ev.as[Ev].collect().sortBy(_.us)
    val (batch1, batch2) = all.splitAt(all.length / 2)
    val sentinel = Ev(-1L, "noise", all.last.us + 30L * 86400000000L)

    val stream = MemoryStream[Ev]
    val sessions = SessionStream.sessions(
      stream.toDF().withColumn("ts", timestamp_micros(col("us"))),
      gap = "4 hours", watermarkDelay = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      stream.addData(batch1.toSeq)
      q.processAllAvailable()
      stream.addData(batch2.toSeq)
      q.processAllAvailable()
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
      val got = spark.table("sess_stream")
        .filter(col("user_id") >= 0)
        .collect().toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
