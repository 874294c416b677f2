package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.FunnelEvent

/** The stateful streaming funnel (flatMapGroupsWithState, event-time
  * timeouts) must reproduce the batch funnel gate's per-day report,
  * including out-of-order purchases that precede their signup across
  * micro-batch boundaries.
  */
class FunnelStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("streamed conversions equal the batch funnel report") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))

    // batch oracle: the funnel gate's relation
    val weekUs = FunnelStream.WindowUs
    val s0 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("s_us"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us"))
    val expected = s0.join(pur,
        col("p_user") === col("user_id") && col("p_us") > col("s_us") &&
          col("p_us") <= col("s_us") + weekUs, "left")
      .groupBy(col("user_id"), col("s_us"))
      .agg(max(when(col("p_us").isNotNull, 1L).otherwise(0L)).as("converted"))
      .select(col("user_id"), col("s_us").as("signup_us"), col("converted"))
      .collect().map(_.toSeq).toSet

    // stream in arrival order that does NOT respect event time inside
    // a batch (purchases of the second half arrive with the first) so
    // purchase-before-signup buffering is exercised
    val all = ev.as[FunnelEvent].collect().sortBy(_.us)
    val (b1, b2) = all.splitAt(all.length / 2)
    val sentinel = FunnelEvent(-1L, "noise",
      all.last.us + 30L * 24 * 3600 * 1000000)

    val stream = MemoryStream[FunnelEvent]
    val out = FunnelStream.conversions(spark, stream.toDS(),
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("funnel_conv")
      .outputMode("append").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
      val got = spark.table("funnel_conv")
        .select(col("user_id"), col("signup_us"), col("converted"))
        .collect().map(_.toSeq).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
