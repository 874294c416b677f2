package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.streaming.KmvStream
import graft.streaming.KmvStream.KmvEvent

/** The incrementally-maintained KMV sketch must end at exactly the
  * batch gate's estimate (same hash, same order statistic, same
  * division — bit-for-bit), however the stream is micro-batched.
  */
class KmvStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("streamed bottom-k state converges to the batch estimate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val expected = SparkEntry.queries("sketch_kmv_distinct")(spark, dir)
      .select(col("event_type"), col("kmv_est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val all = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
      .as[KmvEvent].collect()
    val (b1, b2) = all.splitAt(all.length / 3)

    val stream = MemoryStream[KmvEvent]
    val q = KmvStream.estimates(spark, stream.toDS())
      .writeStream.format("memory").queryName("kmv_est")
      .outputMode("update").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      val got = spark.table("kmv_est")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("kmv_est"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
