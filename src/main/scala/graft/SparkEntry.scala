package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a QuerySpec (Spark query +
  * DuckDB oracle SQL when SQL-expressible). The driver runs each query
  * at sf0.01 via graft.Verify and hash-compares against DuckDB.
  */
object SparkEntry {

  def allSpecs: Seq[QuerySpec] =
    Relational.specs ++ TimeSeriesOps.specs ++ TextOps.specs ++
      DedupOps.specs ++ SimilarityOps.specs ++ PqOps.specs ++
      ClusterOps.specs ++
      MultimodalOps.specs ++
      PipelineOps.specs ++ XrplOps.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
