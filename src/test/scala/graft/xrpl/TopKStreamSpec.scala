package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKey
import graft.streaming.TopKStream
import graft.streaming.TopKStream.TopKEvent

/** The streaming per-key top-k state must converge to exactly the
  * batch custom operator's answer on the same rows, at any
  * micro-batching — the semigroup property of bounded top-k under a
  * total order.
  */
class TopKStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"
  private val K = 3

  test("streamed leaderboards equal the batch custom operator") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type").as("key"), col("event_id").as("id"),
        col("value").as("v"))

    val expected = TopKPerKey.topK(ev, Seq("key"),
        Seq("v" -> true, "id" -> false), K)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).toSet }

    val all = ev.as[TopKEvent].collect()
    val (b1, b2) = all.splitAt(all.length / 2)
    val stream = MemoryStream[TopKEvent]
    val q = TopKStream.topK(spark, stream.toDS(), K)
      .writeStream.format("memory").queryName("topk_lb")
      .outputMode("update").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      val got = spark.table("topk_lb")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("key")).orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
        .select(col("key"), col("ids"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSet)
        .toMap
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
