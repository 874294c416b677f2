package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.streaming.HistStream
import graft.streaming.HistStream.HistEvent

/** The incrementally-maintained log-histogram quantiles must end at
  * exactly the batch gate's estimates (same micros rounding, bucket
  * ids, integer thresholds, lower bounds — bit-for-bit), however the
  * stream is micro-batched.
  */
class HistStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("streamed histogram state converges to the batch estimates") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val expected = SparkEntry.queries("ts_quantile_sketch")(spark, dir)
      .select(col("event_type"), col("p_pct"), col("est"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
      }

    val all = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .as[HistEvent].collect()
    val (b1, b2) = all.splitAt(all.length / 3)

    val stream = MemoryStream[HistEvent]
    val q = HistStream.estimates(spark, stream.toDS())
      .writeStream.format("memory").queryName("hist_est")
      .outputMode("update").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      val got = spark.table("hist_est")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
        .collect()
        .map(r => r.getAs[String]("event_type") -> Map(
          50 -> r.getAs[Double]("est50"),
          90 -> r.getAs[Double]("est90"),
          99 -> r.getAs[Double]("est99")))
        .toMap
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("sub-micro positive values count in bucket 0, like the batch SQL") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[HistEvent]
    val q = HistStream.estimates(spark, stream.toDS())
      .writeStream.format("memory").queryName("hist_zero")
      .outputMode("update").start()
    try {
      // value in (0, 5e-7) rounds to 0 micros — the batch gate's
      // `WHERE value > 0` keeps it (bucket 0, lb 0); so must the state.
      // A key with ONLY out-of-domain values ("y") has no batch row —
      // the stream must emit nothing for it, not NaNs.
      stream.addData(Seq(HistEvent("z", 4e-7), HistEvent("z", 4e-7),
        HistEvent("z", 0.0), HistEvent("z", -1.0),
        HistEvent("y", 0.0), HistEvent("y", -2.5)))
      q.processAllAvailable()
      val r = spark.table("hist_zero").filter($"event_type" === "z")
        .orderBy($"seq".desc).head
      assert(r.getAs[Long]("n") === 2L)
      assert(r.getAs[Double]("est50") === 0.0)
      assert(spark.table("hist_zero").filter($"event_type" === "y").isEmpty)
    } finally q.stop()
  }

  test("bucket/lowerBound mirror the SQL spelling on edge values") {
    // the same fixtures the SQL primitives were cross-checked on
    val cases = Seq(0L -> 0L, 1L -> 1L, 15L -> 15L, 16L -> 64L, 17L -> 65L,
      31L -> 79L, 32L -> 80L, 1000000L -> 318L)
    for ((m, b) <- cases) assert(HistStream.bucket(m) === b, s"m=$m")
    assert(HistStream.lowerBound(318L) === 983040L)
    assert(HistStream.lowerBound(15L) === 15L)
    // lb is idempotent: lb's own bucket is the bucket it bounds
    for (m <- Seq(1L, 17L, 12345L, 987654321L))
      assert(HistStream.bucket(HistStream.lowerBound(HistStream.bucket(m)))
        === HistStream.bucket(m))
  }
}
