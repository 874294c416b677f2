package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream
import graft.streaming.DedupStream.{DocArrival, DedupDecision}

/** Streaming exact dedup: equivalence with the batch digest-groupBy on
  * one batch, and first-seen-keeper semantics across batches.
  */
class DedupStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def arrivalsOf(docs: Seq[(Long, String)]): Seq[DocArrival] = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
      .as[DocArrival].collect().toSeq
  }

  test("single batch equals batch dedup_exact keeper mapping") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "Alpha"), // 3 dups 1 (lowercased)
      (4L, "gamma"), (5L, "beta"))
    val stream = MemoryStream[DocArrival]
    stream.addData(arrivalsOf(docs))
    val q = DedupStream.decisions(spark, stream.toDS())
      .writeStream.format("memory").queryName("dedup_one").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_one").as[DedupDecision].collect()
        .map(d => d.doc_id -> (d.keep_id, d.duplicate)).toMap
      // batch semantics: keeper = min doc_id of the content group
      assert(got(1L) === (1L, false))
      assert(got(3L) === (1L, true))
      assert(got(2L) === (2L, false))
      assert(got(5L) === (2L, true))
      assert(got(4L) === (4L, false))
    } finally q.stop()
  }

  test("later batches flag duplicates against the first-seen keeper") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[DocArrival]
    val q = DedupStream.decisions(spark, stream.toDS())
      .writeStream.format("memory").queryName("dedup_two").outputMode("append")
      .start()
    try {
      stream.addData(arrivalsOf(Seq((10L, "same text"), (11L, "other"))))
      q.processAllAvailable()
      stream.addData(arrivalsOf(Seq((12L, "same text"), (13L, "same text"))))
      q.processAllAvailable()
      val got = spark.table("dedup_two").as[DedupDecision].collect()
        .map(d => d.doc_id -> d).toMap
      assert(!got(10L).duplicate)
      assert(got(12L).duplicate && got(12L).keep_id === 10L)
      assert(got(13L).duplicate && got(13L).keep_id === 10L)
      assert(got(13L).n_seen === 3L)
      assert(!got(11L).duplicate)
    } finally q.stop()
  }
}
