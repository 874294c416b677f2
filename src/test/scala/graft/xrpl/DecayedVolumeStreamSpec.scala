package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DecayedVolumeStream
import graft.streaming.DecayedVolumeStream.Bucket

/** The streamed decayed-volume monitor must (1) reproduce the
  * sequential ring fold for ANY micro-batching — the 30-day ring
  * state carries across batch splits, late duplicates of closed days
  * are dropped — and (2) agree with the BATCH `ts_decayed_volume`
  * gate on real event data at the aligned frontier: for every series
  * with a bucket on the global max day, the stream's final emission
  * equals the gate's row column-for-column.
  */
class DecayedVolumeStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def mkBuckets(): Seq[Bucket] = {
    val rnd = new scala.util.Random(20260816L)
    // 60 days — twice the ring depth, so evictions exercise
    val a = (1 to 60).map(d =>
      Bucket("click", 100L + d, 50L + rnd.nextInt(40)))
    // gappy series: ring holds fewer than 30 live days
    val b = (1 to 60).filter(_ % 3 == 0).map(d =>
      Bucket("view", 100L + d, 30L + rnd.nextInt(20)))
    a ++ b
  }

  test("stream equals the reference fold across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets()
    val expected = DecayedVolumeStream.reference(buckets)
      .sortBy(p => (p.series, p.epoch))
    // eviction must be visible: raw_total at day 60 < total mass
    val last = expected.filter(_.series == "click").last
    assert(last.n_days == 30 &&
      last.raw_total < buckets.filter(_.series == "click").map(_.x).sum,
      "test design: the ring must have evicted old days")

    for (splitAt <- Seq(13, 41, 77)) {
      val (b1, b2) = buckets.splitAt(splitAt)
      val stream = MemoryStream[Bucket]
      val q = DecayedVolumeStream.monitor(spark, stream.toDS())
        .writeStream.format("memory").queryName("decay_pts")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        // late duplicate of an already-closed day: must be dropped
        stream.addData(Seq(Bucket("click", 101L, 999L)))
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("decay_pts")
          .as[DecayedVolumeStream.DecayPoint].collect()
          .sortBy(p => (p.series, p.epoch)).toSeq
        assert(got == expected, s"split at $splitAt diverged")
      } finally q.stop()
    }
  }

  test("final emissions equal the batch gate at the aligned frontier") {
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
    val frontier = daily.map(_.epoch).max
    val finals = DecayedVolumeStream.reference(daily)
      .groupBy(_.series).map { case (s, ps) => ps.maxBy(_.epoch) }
      .filter(_.epoch == frontier)
      .map(p => (p.series, p.n_days, p.raw_total, p.decayed9_micro,
        p.decayed8_micro, p.decayed9, p.freshness_ppm))
      .toSet
    assert(finals.size >= 3,
      "test design: most series must reach the global frontier")
    val gate = graft.SparkEntry
      .queries("ts_decayed_volume")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .filter(g => finals.exists(_._1 == g._1))
      .toSet
    assert(finals == gate,
      "stream frontier totals diverge from the batch gate")
  }
}
