package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EwmaStream
import graft.streaming.EwmaStream.Bucket

/** The streamed integer-EWMA smoother must (1) reproduce the
  * sequential recursion for ANY micro-batching (two-long state
  * carries across splits; late duplicates of closed days are
  * dropped), and (2) equal the batch `ts_ewma` gate ROW-FOR-ROW on
  * real event data — the whole smoothed line, not just the frontier.
  */
class EwmaStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def mkBuckets(): Seq[Bucket] = {
    val rnd = new scala.util.Random(20260816L)
    (1 to 40).map(d => Bucket("click", 100L + d,
      60L + rnd.nextInt(41))) ++
      (1 to 25).map(d => Bucket("view", 200L + d,
        30L + rnd.nextInt(21)))
  }

  test("stream equals the reference fold across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets()
    val expected = EwmaStream.reference(buckets)
      .sortBy(p => (p.series, p.epoch))
    assert(expected.size == buckets.size)

    for (splitAt <- Seq(5, 33, 61)) {
      val (b1, b2) = buckets.splitAt(splitAt)
      val stream = MemoryStream[Bucket]
      val q = EwmaStream.monitor(spark, stream.toDS())
        .writeStream.format("memory").queryName("ewma_pts")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        // late duplicate of a closed day: must be dropped
        stream.addData(Seq(Bucket("click", 101L, 999L)))
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("ewma_pts")
          .as[EwmaStream.EwmaPoint].collect()
          .sortBy(p => (p.series, p.epoch)).toSeq
        assert(got == expected, s"split at $splitAt diverged")
      } finally q.stop()
    }
  }

  test("the full smoothed line equals the batch ts_ewma gate") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("event_type").as("series"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("x"))
      .select(col("series"),
        datediff(col("day"), lit("1970-01-01")).cast("long")
          .as("epoch"),
        col("x"))
      .as[Bucket].collect().toSeq
    val line = EwmaStream.reference(daily)
      .map(p => (p.series, p.epoch, p.x, p.ewma)).toSet
    val gate = graft.SparkEntry.queries("ts_ewma")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2), r.getLong(3))).toSet
    assert(line.size > 100, "test design: real data must emit a line")
    assert(line == gate, "stream line diverges from the batch gate")
  }
}
