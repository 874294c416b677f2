package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
