package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MergeStream
import graft.streaming.MergeStream.{Chg, MergeRow}

/** The streamed upsert view's LATEST emission per key must equal the
  * batch MERGE gate on every touched key, for any micro-batching:
  * live rows (balance, src) match exactly in integer micros, and the
  * keys the batch gate's DELETE branch drops are exactly the
  * tombstoned ones — including a key that crosses the hot threshold
  * only in a later micro-batch (first emitted live, then re-emitted
  * deleted).
  */
class MergeStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  private def micros(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,6)") * 1000000).cast("long")

  /** The batch gate's changeset, one row per qualifying order, with
    * the snapshot base attached (the stream-static join). */
  private def changeRows(): Seq[Chg] = {
    import spark.implicits._
    val chg = graft.Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O" &&
        col("o_orderdate") >= expr("TIMESTAMP '1998-01-01 00:00:00'"))
      .select((col("o_custkey") +
          when(col("o_custkey") % 3 === 0, 10000000L).otherwise(0L)).as("k"),
        micros(col("o_totalprice")).as("deltaMicros"))
    val base = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey").as("k"),
        micros(col("c_acctbal")).as("baseMicros"))
    chg.join(base, Seq("k"), "left")
      .select(col("k"), col("baseMicros").isNotNull.as("hasBase"),
        coalesce(col("baseMicros"), lit(0L)).as("baseMicros"),
        col("deltaMicros"))
      .as[Chg].collect().toSeq.sortBy(c => (c.k, c.deltaMicros))
  }

  test("latest streamed view equals the batch MERGE across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val rows = changeRows()
    assert(rows.nonEmpty)

    // batch truth: live (non-kept) rows and the deleted key set
    val batchLive = graft.SparkEntry.queries("store_merge_upsert")(spark, dir)
      .filter(col("src") =!= "kept")
      .select(col("c_custkey").as("k"),
        micros(col("balance")).as("balanceMicros"), col("src"))
      .as[(Long, Long, String)].collect().toSet
    val expectedDeleted = rows.groupBy(_.k).collect {
      case (k, cs) if cs.head.hasBase && cs.size >= 3 => k
    }.toSet
    assert(expectedDeleted.nonEmpty, "test design: delete branch must fire")

    for (splitAt <- Seq(rows.size / 3, rows.size / 2, rows.size - 1)) {
      val (b1, b2) = rows.splitAt(splitAt)
      val stream = MemoryStream[Chg]
      val q = MergeStream.upsertView(spark, stream.toDS())
        .writeStream.format("memory").queryName("merge_view")
        .outputMode("update").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        val mid = spark.table("merge_view").as[MergeRow].collect().toSeq
        stream.addData(b2)
        q.processAllAvailable()
        val latest = spark.table("merge_view").as[MergeRow].collect().toSeq
          .groupBy(_.k).map { case (_, rs) => rs.maxBy(_.n) }.toSeq

        val gotLive = latest.filterNot(_.deleted)
          .map(r => (r.k, r.balanceMicros, r.src)).toSet
        assert(gotLive === batchLive, s"splitAt=$splitAt")
        assert(latest.filter(_.deleted).map(_.k).toSet === expectedDeleted,
          s"splitAt=$splitAt")

        // CDF discipline: a key tombstoned only by batch 2 was first
        // emitted LIVE in batch 1 — the late-arriving delete really is
        // a re-emission, not a first sighting.
        val lateDeleted = expectedDeleted.filter { k =>
          b1.count(_.k == k) > 0 && b1.count(_.k == k) < 3
        }
        lateDeleted.foreach { k =>
          assert(mid.exists(r => r.k == k && !r.deleted),
            s"splitAt=$splitAt key=$k should be live after batch 1")
        }
      } finally q.stop()
    }
  }
}
