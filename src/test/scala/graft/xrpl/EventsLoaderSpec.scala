package graft.xrpl

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract for `graft.Tables.events` (see TESTDATA.md): the
  * driver has regenerated `events.parquet` with different physical
  * types for `ts` across rounds — epoch-nanos long (the legacy
  * TIMESTAMP(NANOS) read), TIMESTAMP_NTZ (micros without the
  * UTC-adjusted flag), and plain TIMESTAMP. The round-8 regression
  * (10 gates + 10 specs down) was exactly this drift hitting readers
  * that assumed one physical type; this spec pins the loader's
  * normalization for all three so the next drift fails HERE first.
  */
class EventsLoaderSpec extends AnyFunSuite {
  private val spark = SparkTest.session
  import spark.implicits._

  /** One reference instant, 2024-03-01T06:30:15.123456Z. */
  private val micros = 1709274615123456L

  private def writeDir(): String =
    Files.createTempDirectory("graft-events-loader").toString

  private def loadedMicros(dir: String): Long = {
    val df = graft.Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      "loader must always yield TIMESTAMP (LTZ)")
    df.select(unix_micros(col("ts"))).head().getLong(0)
  }

  test("epoch-nanos long ts (legacy TIMESTAMP(NANOS) read) is normalized") {
    val dir = writeDir()
    Seq((1L, micros * 1000L, "click"))
      .toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) === micros)
  }

  test("TIMESTAMP_NTZ ts is normalized to the same epoch micros under UTC") {
    val dir = writeDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("event_type", StringType)))
    val row = Row(1L, java.time.LocalDateTime.ofEpochSecond(
      micros / 1000000L, ((micros % 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC), "click")
    spark.createDataFrame(
        java.util.Collections.singletonList(row), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) === micros)
  }

  test("plain TIMESTAMP ts passes through unchanged") {
    val dir = writeDir()
    Seq((1L, new java.sql.Timestamp(micros / 1000L), "click"))
      .toDF("event_id", "ts", "event_type")
      .withColumn("ts", timestamp_micros(lit(micros)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) === micros)
  }

  test("NTZ ts under a non-UTC session zone fails loudly, not silently shifted") {
    val dir = writeDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType)))
    val row = Row(1L, java.time.LocalDateTime.ofEpochSecond(
      micros / 1000000L, 0, java.time.ZoneOffset.UTC))
    spark.createDataFrame(
        java.util.Collections.singletonList(row), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        graft.Tables.events(spark, dir).collect()
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set(tzKey, saved)
  }
}
