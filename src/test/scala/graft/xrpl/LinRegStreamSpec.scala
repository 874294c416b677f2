package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeriesOps
import graft.streaming.LinRegStream

/** MemoryStream element for [[LinRegStreamSpec]]. */
case class LinEv(event_type: String, us: Long, value: Double)

/** The streamed sufficient-statistics aggregation must equal the
  * batch ts_linreg_trend gate bit-for-bit, including when a series'
  * points straddle a micro-batch boundary — the decimal-exact sums
  * make accumulation order immaterial.
  */
class LinRegStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("streamed sufficient stats + closed form equal the batch gate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("value"))

    val expected = TimeSeriesOps.linregClosedForm(TimeSeriesOps.linregStats(
        TimeSeriesOps.linregPoints(
          ev.withColumn("ts", timestamp_micros(col("us"))))))
      .collect().map(_.toSeq).toSet

    val all = ev.as[LinEv].collect().sortBy(_.us)
    val (b1, b2) = all.splitAt(all.length / 2)

    val stream = MemoryStream[LinEv]
    val stats = LinRegStream.stats(
      stream.toDF().withColumn("ts", timestamp_micros(col("us"))))
    val q = stats.writeStream.format("memory").queryName("linreg_stats")
      .outputMode("complete").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      val got = TimeSeriesOps.linregClosedForm(spark.table("linreg_stats"))
        .collect().map(_.toSeq).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
