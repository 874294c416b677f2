package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AttributionStream
import graft.streaming.AttributionStream.TouchEvent

/** The stateful streaming last-touch attribution
  * (flatMapGroupsWithState, event-time timeouts) must reproduce the
  * batch `attr_last_touch` relation — including touches that arrive
  * AFTER the purchase they win, across micro-batch boundaries.
  */
class AttributionStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("streamed attributions equal the batch as-of relation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

    // batch oracle: per purchase, the max-(ts, id) touch at-or-before
    val tch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("t_user"), col("us").as("t_us"),
        col("event_id").as("t_id"), col("event_type").as("t_type"))
    val expected = ev.filter(col("event_type") === "purchase")
      .join(tch, col("t_user") === col("user_id") && col("t_us") <= col("us"),
        "left")
      .groupBy(col("event_id"), col("user_id"), col("us"))
      .agg(max_by(struct(col("t_id"), col("t_type")),
        struct(col("t_us"), col("t_id"))).as("w"))
      .select(col("event_id"), col("user_id"), col("us").as("ts_us"),
        col("w.t_id").as("touch_id"), col("w.t_type").as("touch_type"))
      .collect().map(_.toSeq).toSet

    // arrival order breaks event order across the batch split, so
    // touch-after-purchase buffering is exercised at the boundary
    val all = ev.as[TouchEvent].collect().sortBy(e => (e.us, e.event_id))
    val (b1, b2) = all.splitAt(all.length / 2)
    val sentinel = TouchEvent(-1L, -1L, "noise",
      all.last.us + 30L * 24 * 3600 * 1000000)

    val stream = MemoryStream[TouchEvent]
    val out = AttributionStream.attributions(spark, stream.toDS(),
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
      val got = spark.table("attr_stream")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("touch_id"), col("touch_type"))
        .collect().map(_.toSeq).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
