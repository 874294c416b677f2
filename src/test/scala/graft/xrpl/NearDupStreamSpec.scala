package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDupStream

/** Streaming banded MinHash near-dup: the candidate pair set must
  * equal the batch banded join on one batch, and late arrivals must
  * pair against earlier bucket members.
  */
class NearDupStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog!"), // near-dup of 1
    (3L, "entirely different content with nothing shared here"),
    (4L, "the quick brown fox jumps over the lazy dog")) // exact dup of 1

  private def batchCandidates(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
    import spark.implicits._
    val bands = NearDupStream.bandArrivals(spark, rows.toDS()).collect()
    (for {
      a <- bands; b <- bands
      if a.band == b.band && a.key == b.key && a.doc_id < b.doc_id
    } yield (a.doc_id, b.doc_id)).toSet
  }

  test("single batch equals the batch banded candidate set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs)
    val q = NearDupStream.candidates(spark, stream.toDS())
      .writeStream.format("memory").queryName("neardup_one")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("neardup_one")
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = batchCandidates(docs)
      assert(got === expected)
      assert(got.contains((1L, 4L))) // exact dups share every band
      assert(!got.exists { case (a, b) => a == 3L || b == 3L })
    } finally q.stop()
  }

  test("later batches pair against earlier bucket members") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = NearDupStream.candidates(spark, stream.toDS())
      .writeStream.format("memory").queryName("neardup_two")
      .outputMode("append").start()
    try {
      stream.addData(docs.take(3))
      q.processAllAvailable()
      stream.addData(Seq(docs(3))) // doc 4 arrives later
      q.processAllAvailable()
      val got = spark.table("neardup_two")
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === batchCandidates(docs)) // same set, discovered online
    } finally q.stop()
  }
}
