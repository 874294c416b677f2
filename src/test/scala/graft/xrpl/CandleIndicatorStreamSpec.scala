package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CandleIndicatorStream
import graft.streaming.CandleIndicatorStream.Candle

/** The streamed RSI/ATR monitor must (1) reproduce the sequential
  * 15-candle ring fold for ANY micro-batching, dropping late
  * duplicates of closed days, and (2) agree with the batch `ts_rsi`
  * and `ts_atr` gates on real event data: every emitted point matches
  * the gates' row at the same (series, day) column-for-column (the
  * stream's emission horizon is the RSI gate's — row 15 on — so ATR's
  * one earlier row, whose window still holds the first-row true-range
  * fallback, is outside the twin by design).
  */
class CandleIndicatorStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def mkCandles(): Seq[Candle] = {
    val rnd = new scala.util.Random(20260816L)
    def series(name: String, n: Int, base: Long): Seq[Candle] =
      (1 to n).map { d =>
        val o = base + rnd.nextInt(200) - 100
        val c = o + rnd.nextInt(120) - 60
        val h = math.max(o, c) + rnd.nextInt(40)
        val l = math.min(o, c) - rnd.nextInt(40)
        Candle(name, 100L + d, o, c, h, l)
      }
    // one long series, one that never fills the ring (no emissions)
    series("click", 40, 5000L) ++ series("view", 9, 3000L)
  }

  test("stream equals the reference fold across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val candles = mkCandles()
    val expected = CandleIndicatorStream.reference(candles)
      .sortBy(p => (p.series, p.epoch))
    assert(expected.nonEmpty && !expected.exists(_.series == "view"),
      "test design: only the 40-day series fills the 15-candle ring")

    for (splitAt <- Seq(7, 22, 45)) {
      val (c1, c2) = candles.splitAt(splitAt)
      val stream = MemoryStream[Candle]
      val q = CandleIndicatorStream.monitor(spark, stream.toDS())
        .writeStream.format("memory").queryName("ta_pts")
        .outputMode("append").start()
      try {
        stream.addData(c1)
        q.processAllAvailable()
        // late duplicate of a closed day: must be dropped
        stream.addData(Seq(Candle("click", 101L, 1L, 1L, 1L, 1L)))
        q.processAllAvailable()
        stream.addData(c2)
        q.processAllAvailable()
        val got = spark.table("ta_pts")
          .as[CandleIndicatorStream.IndicatorPoint].collect()
          .sortBy(p => (p.series, p.epoch)).toSeq
        assert(got == expected, s"split at $splitAt diverged")
      } finally q.stop()
    }
  }

  test("emissions equal the batch ts_rsi and ts_atr gates") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val candles = graft.operators.TimeSeriesOps.dailyOhlc(spark, dir)
      .select(col("series"),
        datediff(col("day"), lit("1970-01-01")).cast("long")
          .as("epoch"),
        col("open_c"), col("close_c"), col("high_c"), col("low_c"))
      .as[Candle].collect().toSeq
    val pts = CandleIndicatorStream.reference(candles)
    assert(pts.size > 50, "test design: real data must emit points")

    def epochOf(r: org.apache.spark.sql.Row): Long =
      r.getDate(1).toLocalDate.toEpochDay
    val rsiGate = graft.SparkEntry.queries("ts_rsi")(spark, dir)
      .collect()
      .map(r => (r.getString(0), epochOf(r)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val atrGate = graft.SparkEntry.queries("ts_atr")(spark, dir)
      .collect()
      .map(r => (r.getString(0), epochOf(r)) ->
        (r.getLong(2), r.getLong(3))).toMap

    // exact horizon: the stream emits precisely the RSI gate's rows
    assert(pts.map(p => (p.series, p.epoch)).toSet == rsiGate.keySet,
      "stream horizon diverges from the RSI gate")
    pts.foreach { p =>
      assert(rsiGate((p.series, p.epoch)) ==
        ((p.gain_c, p.loss_c, p.rsi_ppm)),
        s"RSI mismatch at ${p.series}/${p.epoch}")
      assert(atrGate((p.series, p.epoch)) == ((p.tr_c, p.atr_c)),
        s"ATR mismatch at ${p.series}/${p.epoch}")
    }
  }
}
