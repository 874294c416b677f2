package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeriesOps
import graft.streaming.AnomalyStream

/** MemoryStream element for [[AnomalyStreamSpec]]. */
case class AnomEv(event_type: String, us: Long)

/** The streaming pipeline (watermarked daily counts → batch z-flag
  * query over the sink) must produce exactly the batch gate's rows,
  * including days whose events span a micro-batch boundary.
  */
class AnomalyStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("streamed daily counts + batch flags equal the batch gate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))

    val expected = TimeSeriesOps.anomalyFlags(
      ev.groupBy(col("event_type"),
          to_date(timestamp_micros(col("us"))).as("day"))
        .agg(count(lit(1)).as("n_events")))
      .collect().map(_.toSeq).toSet

    // stream the events in time order, split mid-timeline so days
    // straddle micro-batches; a far-future sentinel closes every
    // real day past the watermark
    val all = ev.as[AnomEv].collect().sortBy(_.us)
    val (b1, b2) = all.splitAt(all.length / 2)
    val sentinel = AnomEv("noise-sentinel", all.last.us + 40L * 86400000000L)

    val stream = MemoryStream[AnomEv]
    val daily = AnomalyStream.dailyCounts(
      stream.toDF().withColumn("ts", timestamp_micros(col("us"))),
      watermarkDelay = "1 minute")
    val q = daily.writeStream.format("memory").queryName("anom_daily")
      .outputMode("append").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
      val sinkDaily = spark.table("anom_daily")
        .filter(col("event_type") =!= "noise-sentinel")
      val got = TimeSeriesOps.anomalyFlags(sinkDaily)
        .collect().map(_.toSeq).toSet
      assert(got === expected)
      assert(got.nonEmpty)

      // the EWMA fold over the same streamed sink must equal the
      // batch ts_ewma relation — same stream ≡ batch split
      val expectedEwma = TimeSeriesOps.ewmaFold(
        ev.groupBy(col("event_type"),
            to_date(timestamp_micros(col("us"))).as("day"))
          .agg(count(lit(1)).as("n_events")))
        .collect().map(_.toSeq).toSet
      val gotEwma = TimeSeriesOps.ewmaFold(sinkDaily)
        .collect().map(_.toSeq).toSet
      assert(gotEwma === expectedEwma)
      assert(gotEwma.nonEmpty)
    } finally q.stop()
  }
}
