package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros, to_timestamp_ltz}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loader for the driver-generated parquet tables (see TESTDATA.md).
  * One parquet file per table; Catalyst handles column pruning and
  * predicate pushdown into the scan, so every query should read only
  * the columns/row-groups it needs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table with `ts` normalized to TIMESTAMP (LTZ).
    *
    * The driver's generator has emitted different physical types for
    * `ts` across testdata revisions: parquet TIMESTAMP(NANOS), readable
    * only as an epoch-nanos long under the legacy flag; TIMESTAMP(MICROS)
    * without the UTC-adjusted flag, which Spark 4 reads as TIMESTAMP_NTZ;
    * and plain UTC-adjusted TIMESTAMP. Every event reader — operators,
    * Bench, Verify, and the test specs — must come through here so the
    * next schema drift is a one-line change (TESTDATA.md, "events schema
    * contract").
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    val ts = df.schema("ts").dataType match {
      // Epoch-nanos long: integer `div` (not `/`) — nanos ≈ 1.7e18
      // overflows the 53-bit double mantissa a float division uses.
      case LongType => timestamp_micros(expr("ts div 1000"))
      // NTZ → LTZ preserves the epoch micros only under a UTC session
      // time zone (Bench/Verify/SparkTest all pin it). Fail loudly on
      // any other zone rather than silently shifting every timestamp.
      case TimestampNTZType =>
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ; normalization requires session timeZone=UTC, got $tz")
        to_timestamp_ltz(col("ts"))
      case _ => col("ts")
    }
    df.withColumn("ts", ts)
  }
}

/** One graded operator: a Spark query plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL. Column names/aliases MUST match between
  * the two — the driver sorts columns by name before hashing values.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  /** Query with a DuckDB oracle (strong hash-equality check). */
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))

  /** Query with no SQL-expressible oracle (weaker rows-only check). */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}
