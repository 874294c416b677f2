package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RangeJoinStream
import graft.streaming.RangeJoinStream.{ClickEvent, PurchaseEvent}

/** The stream-stream range join must emit exactly the batch
  * point-in-interval pair set on the same rows, with both sides
  * arriving across interleaved micro-batches (pairs whose two halves
  * land in different micro-batches exercise the state-store
  * buffering).
  */
class RangeJoinStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"
  private val daySec = 86400L
  private val dayUs = daySec * 1000000L

  test("stream-stream join equals the batch range join across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("p_us"))
      .as[PurchaseEvent].collect().toSeq
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("us").as("c_us"))
      .as[ClickEvent].collect().toSeq

    // batch truth: the same bucketed equi-join the gate runs
    val pDf = purchases.toDF().withColumn("t1", col("p_us") + dayUs)
    val cDf = clicks.toDF()
    val expected = graft.functions.RangeJoin.pointInInterval(
        pDf, "user_id", "p_us", "t1", cDf, "click_user", "c_us", dayUs)
      .select(col("i_event_id"), col("i_user_id"), col("i_p_us"),
        col("p_c_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val pStream = MemoryStream[PurchaseEvent]
    val cStream = MemoryStream[ClickEvent]
    val q = RangeJoinStream
      .matchedPairs(spark, pStream.toDS(), cStream.toDS(), daySec, "30 days")
      .writeStream.format("memory").queryName("rjstream").outputMode("append")
      .start()
    try {
      // interleave: batch 1 = first half of purchases + SECOND half of
      // clicks, batch 2 the converse — many pairs split across batches
      val (p1, p2) = purchases.splitAt(purchases.size / 2)
      val (c1, c2) = clicks.splitAt(clicks.size / 2)
      pStream.addData(p1); cStream.addData(c2)
      q.processAllAvailable()
      pStream.addData(p2); cStream.addData(c1)
      q.processAllAvailable()
      val got = spark.table("rjstream")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === expected)
      assert(got.nonEmpty, "fixture produced no in-window pairs")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched purchases on watermark close") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("p_us"))
      .as[PurchaseEvent].collect().toSeq
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("us").as("c_us"))
      .as[ClickEvent].collect().toSeq

    // batch truth: inner pairs plus a NULL row per unmatched purchase
    val inner = graft.functions.RangeJoin.pointInInterval(
        purchases.toDF().withColumn("t1", col("p_us") + dayUs),
        "user_id", "p_us", "t1", clicks.toDF(), "click_user", "c_us", dayUs)
      .select(col("i_event_id"), col("i_user_id"), col("i_p_us"),
        col("p_c_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getLong(3))))
    val matchedIds = inner.map(_._1).toSet
    val expected = (inner ++ purchases
      .filterNot(p => matchedIds(p.event_id))
      .map(p => (p.event_id, p.user_id, p.p_us, None))).toSet

    val pStream = MemoryStream[PurchaseEvent]
    val cStream = MemoryStream[ClickEvent]
    // tight-ish lateness + a far-future sentinel on BOTH sides: the
    // outer rows emit only when both watermarks pass a purchase's
    // window end, so the sentinel must advance purchase AND click time
    val q = RangeJoinStream
      .matchedPairsOuter(spark, pStream.toDS(), cStream.toDS(), daySec,
        "1 hour")
      .writeStream.format("memory").queryName("rjouter")
      .outputMode("append")
      .start()
    try {
      val maxUs = (purchases.map(_.p_us) ++ clicks.map(_.c_us)).max
      val farUs = maxUs + 200L * dayUs
      pStream.addData(purchases)
      cStream.addData(clicks)
      q.processAllAvailable()
      // watermark sentinel (filtered from the compare by user -1); a
      // second micro-batch after it lets the state-cleanup pass emit
      pStream.addData(Seq(PurchaseEvent(-1L, -1L, farUs)))
      cStream.addData(Seq(ClickEvent(-1L, farUs)))
      q.processAllAvailable()
      pStream.addData(Seq(PurchaseEvent(-2L, -1L, farUs + 1L)))
      cStream.addData(Seq(ClickEvent(-1L, farUs + 1L)))
      q.processAllAvailable()
      val got = spark.table("rjouter")
        .filter(col("user_id") =!= -1L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      assert(got === expected)
      assert(got.exists(_._4.isEmpty),
        "fixture produced no unmatched purchases — outer path untested")
      assert(got.exists(_._4.nonEmpty))
    } finally q.stop()
  }
}
