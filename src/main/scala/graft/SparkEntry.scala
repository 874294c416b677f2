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

  /** Declaration-ordered sections, each with a post-section
    * cache-release hook Bench runs after the section's last timed
    * query. A hook may only release caches whose LAST consumer is that
    * section; the cross-section flows that pin releases later than
    * their owner are: TextOps.winnowFps → dedup (winnow pairs),
    * SimilarityOps signatures/knnEdges → pq + cluster gates, and the
    * dedup signature/candidate caches → pipeline (curate_corpus_near).
    * At warehouse scale each of these caches is a write-once table;
    * the hooks model dropping it when the last pipeline stage is done.
    */
  def sections: Seq[(String, Seq[QuerySpec], (SparkSession, String) => Unit)] =
    Seq(
      ("relational", Relational.specs ++ TpchFull.specs,
        (s, d) => {
          Relational.releaseCaches(s, d)
          TpchFull.releaseCaches(s, d)
        }),
      ("timeseries", TimeSeriesOps.specs, (_, _) => ()),
      ("text", TextOps.specs, (_, _) => ()),
      ("entity", EntityOps.specs,
        (s, d) => EntityOps.releaseCaches(s, d)),
      ("dedup", DedupOps.specs,
        (s, d) => TextOps.releaseCaches(s, d)),
      ("similarity", SimilarityOps.specs, (_, _) => ()),
      ("pq", PqOps.specs, (s, _) => PqOps.clearPqModel(Some(s))),
      ("cluster", ClusterOps.specs, (s, d) => {
        SimilarityOps.releaseCaches(s, d)
        ClusterOps.clearKmeansCentroids(Some(s))
        ClusterOps.clearUndirectedEdges(Some(s))
      }),
      ("multimodal", MultimodalOps.specs, (_, _) => ()),
      ("pipeline", PipelineOps.specs,
        (s, d) => {
          DedupOps.releaseCaches(s, d)
          PipelineOps.releaseCaches(s, d)
        }),
      ("privacy", PrivacyOps.specs, (_, _) => ()),
      ("feature", FeatureOps.specs, (_, _) => ()),
      ("xrpl", XrplOps.specs, (_, _) => ()))

  def allSpecs: Seq[QuerySpec] = sections.flatMap(_._2)

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
