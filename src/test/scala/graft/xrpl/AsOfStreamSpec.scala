package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AsOfJoin
import graft.streaming.AsOfStream
import graft.streaming.AsOfStream.{Enriched, Probe}

/** Streaming as-of enrichment must equal the batch AsOfJoin on the
  * same build/probe data.
  */
class AsOfStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("stream enrichment equals the batch as-of join row for row") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // build: one (totalprice) row per (cust, date) — batch contract
    val ords = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("price"))
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        col("price"))
    val index = spark.sparkContext.broadcast(
      AsOfStream.buildIndex(ords, "o_custkey", "t", "price"))

    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"))
    val probes = ev.select(col("event_id").as("id"),
      col("user_id").as("key"), col("t_us").as("t")).as[Probe]

    val stream = MemoryStream[Probe]
    val all = probes.collect().toSeq
    val (a, b) = all.splitAt(all.size / 2)
    val q = AsOfStream.enrich(spark, stream.toDS(), index)
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val got = spark.table("asof_stream").as[Enriched].collect()
        .map(e => e.id -> e.value).toMap

      val batch = AsOfJoin.asofBackward(
          ev.select(col("event_id"), col("user_id"), col("t_us")),
          "user_id", "t_us",
          ords.select(col("o_custkey"), col("t"), col("price")),
          "o_custkey", "t", Seq("price"))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toMap
      assert(got === batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("buildIndex rejects a build side over the row cap") {
    import spark.implicits._
    val build = spark.range(0, 100)
      .select(col("id").as("k"), col("id").as("t"),
        col("id").cast("double").as("v"))
    // under the cap: builds fine
    assert(AsOfStream.buildIndex(build, "k", "t", "v", maxRows = 100)
      .size === 100)
    // over the cap: fails loudly instead of OOMing the driver
    val e = intercept[IllegalArgumentException] {
      AsOfStream.buildIndex(build, "k", "t", "v", maxRows = 99)
    }
    assert(e.getMessage.contains("broadcast-dimension"))
  }
}
