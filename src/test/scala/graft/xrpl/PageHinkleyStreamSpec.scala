package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PageHinkleyStream
import graft.streaming.PageHinkleyStream.Bucket

/** The streamed Page–Hinkley monitor must reproduce the sequential
  * reference recursion for ANY micro-batching — including a series
  * split mid-run (running mean/min state carries across batches) and
  * late duplicates of closed buckets (dropped). The step series must
  * alarm after its +50% shift; the steady series must stay quiet.
  */
class PageHinkleyStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  // λ in ppm of x units: 3.5× a ~70-level mean, the batch gate's rule.
  private val lambda = Map("click" -> 245000000L)
  private val default = 210000000L

  private def mkBuckets(): Seq[Bucket] = {
    val rnd = new scala.util.Random(20260816L)
    val steady = (1 to 20).map(d =>
      Bucket("click", d.toLong, 70L + rnd.nextInt(11) - 5))
    // sustained +50% shift past day 20 — PH must catch the new mean
    val shifted = (21 to 40).map(d =>
      Bucket("click", d.toLong, 105L + rnd.nextInt(11) - 5))
    val other = (1 to 35).map(d =>
      Bucket("view", d.toLong, 60L + rnd.nextInt(11) - 5))
    steady ++ shifted ++ other
  }

  test("stream equals the reference fold across micro-batch splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets()
    val expected = PageHinkleyStream
      .reference(buckets, lambda, default)
      .sortBy(p => (p.series, p.epoch))
    assert(expected.exists(p => p.series == "click" && p.alarm),
      "test design: the shift must alarm")
    assert(!expected.exists(p => p.series == "view" && p.alarm),
      "test design: the steady series must not alarm")

    for (splitAt <- Seq(9, 27, 55)) {
      val (b1, b2) = buckets.splitAt(splitAt)
      val stream = MemoryStream[Bucket]
      val q = PageHinkleyStream
        .monitor(spark, stream.toDS(), lambda, default)
        .writeStream.format("memory").queryName("ph_pts")
        .outputMode("append").start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
        val got = spark.table("ph_pts")
          .as[PageHinkleyStream.PhPoint].collect().toSeq
          .sortBy(p => (p.series, p.epoch))
        assert(got === expected, s"splitAt=$splitAt")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS ph_pts")
      }
    }
  }

  test("late duplicates of closed buckets are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val buckets = mkBuckets().filter(_.series == "click")
    val expected = PageHinkleyStream
      .reference(buckets, lambda, default).sortBy(_.epoch)

    val stream = MemoryStream[Bucket]
    val q = PageHinkleyStream
      .monitor(spark, stream.toDS(), lambda, default)
      .writeStream.format("memory").queryName("ph_dup")
      .outputMode("append").start()
    try {
      stream.addData(buckets.take(12))
      q.processAllAvailable()
      // replay an already-consumed bucket with a different value: no
      // output row, no state perturbation — the suffix must still
      // match the reference exactly
      stream.addData(Seq(Bucket("click", 5L, 999L)))
      q.processAllAvailable()
      stream.addData(buckets.drop(12))
      q.processAllAvailable()
      val got = spark.table("ph_dup")
        .as[PageHinkleyStream.PhPoint].collect().toSeq
        .sortBy(_.epoch)
      assert(got === expected)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ph_dup")
    }
  }

  test("first-bucket deviation is identically zero (batch-gate parity)") {
    // The batch ts_page_hinkley gate's running min ranges over the
    // M_t values only; the stream seeds minM = 0. These agree BECAUSE
    // M_1 = 0 exactly (x·10⁶ − (x·10⁶ div 1) = 0) — pin it so a
    // refactor can't silently break the equivalence.
    val ref = PageHinkleyStream.reference(
      Seq(Bucket("s", 1L, 12345L)), Map.empty, 1L)
    assert(ref.head.mt_ppm == 0L && ref.head.ph_ppm == 0L)
  }
}
