package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.DotProductLong.dot_long
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (64-dim float vectors).
  *
  * Cross-engine determinism: floats are quantized to integer
  * micro-units (round(x·1e6)) before any arithmetic, so dot products
  * are exact integer math — identical bits in Spark (long fold) and
  * DuckDB (list_dot_product; values < 2^53 so the double result is
  * exact). Cosine then divides identical doubles by identical
  * correctly-rounded sqrts.
  *
  * Scale design: brute-force is the verifiable baseline (O(q·n), query
  * side broadcast); the IVF variant restricts the search to the
  * query's coarse cell (`label` = precomputed coarse-quantizer
  * assignment), the standard inverted-file ANN layout — at 100 TB the
  * cell id is the shuffle/partition key and each cell's postings list
  * is scanned locally.
  *
  * Plan shape (the expensive parts, deliberately):
  *   - the quantized signature table is computed ONCE and cached
  *     (`signatures`) — locally a Spark cache, at 100 TB a write-once
  *     parquet table; every query (both join sides included) reuses it
  *     instead of re-scanning + re-quantizing the embeddings;
  *   - pair scoring uses a native codegen'd integer dot product
  *     ([[graft.functions.DotProductLong]]) instead of interpreted
  *     `aggregate(zip_with(...))` higher-order functions — the per-pair
  *     inner loop is the whole cost of within-cell pair generation;
  *   - within-cell pair generation is bounded: cells larger than
  *     [[maxCellSize]] are truncated (deterministically, by vec_id) so
  *     one hot cell cannot go O(cell²) — same contract as an LSH
  *     band-bucket cap. The default never triggers at test scale.
  */
object SimilarityOps {

  /** Hard bound on vectors considered per cell in pair-generation
    * paths; a cell beyond this is deterministically truncated (lowest
    * vec_id first). Far above test-data cell sizes — exists so the
    * worst-case cost per cell is capped at C(maxCellSize, 2) at any
    * data scale.
    */
  val maxCellSize = 100000

  // Same quantization, one spelling per engine: Spark higher-order
  // `transform`, DuckDB `list_transform`.
  private val quantizeSpark =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  private val quantizeDuck =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  /** vec_id, label, quantized vector, squared norm (exact integer),
    * in-cell rank (for the cell-size cap). Cached: Spark's CacheManager
    * keys on the analyzed plan, so every caller — including both sides
    * of a self-join — shares one materialization per (dir).
    */
  private def signatures(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), expr(quantizeSpark).as("qv"))
      .withColumn("norm2", dot_long(col("qv"), col("qv")))
      .withColumn("cell_rank", row_number().over(w))
      .cache()
  }

  private val quantizedSql =
    s"""SELECT vec_id, label, $quantizeDuck AS qv,
       |  list_dot_product($quantizeDuck, $quantizeDuck) AS norm2
       |FROM embeddings""".stripMargin

  private def topk(s: SparkSession, dir: String, sameCell: Boolean): DataFrame = {
    val base = signatures(s, dir)
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("label").as("q_label"),
        col("qv").as("qa"), col("norm2").as("q_norm2"))
    val cand = base.select(col("vec_id").as("vid"), col("label").as("c_label"),
      col("qv").as("qb"), col("norm2").as("c_norm2"))
    val joinCond =
      if (sameCell) col("q_label") === col("c_label") && col("qid") =!= col("vid")
      else col("qid") =!= col("vid")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    broadcast(q).join(cand, joinCond)
      .withColumn("dot", dot_long(col("qa"), col("qb")))
      .withColumn("cos", expr(
        "CAST(dot AS DOUBLE) / (sqrt(CAST(q_norm2 AS DOUBLE)) * sqrt(CAST(c_norm2 AS DOUBLE)))"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("vid"), col("cos"), col("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  private def topkSql(cellFilter: String): String =
    s"""SELECT qid, vid, cos, rnk FROM (
       |  SELECT qid, vid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
       |  FROM (
       |    SELECT a.vec_id AS qid, b.vec_id AS vid,
       |      list_dot_product(a.qv, b.qv)
       |        / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE)))
       |        AS cos
       |    FROM ($quantizedSql) a JOIN ($quantizedSql) b
       |      ON a.vec_id < 10 AND b.vec_id <> a.vec_id $cellFilter))
       |WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    // Brute-force exact top-k cosine — the ANN correctness baseline.
    QuerySpec.sql("sim_brute_topk", topkSql("")) { (s, dir) =>
      topk(s, dir, sameCell = false)
    },

    // IVF-style ANN: search only the query's coarse cell (label).
    QuerySpec.sql("sim_ivf_topk", topkSql("AND a.label = b.label")) { (s, dir) =>
      topk(s, dir, sameCell = true)
    },

    // Embedding near-dup candidates: same-cell pairs above a cosine
    // threshold (the embedding-cosine dedup path).
    QuerySpec.sql(
      "dedup_embedding_cosine",
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  list_dot_product(a.qv, b.qv)
         |    / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE)))
         |    AS cos
         |FROM ($quantizedSql) a JOIN ($quantizedSql) b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE list_dot_product(a.qv, b.qv)
         |    / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE)))
         |    >= 0.3
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val base = signatures(s, dir).filter(col("cell_rank") <= maxCellSize)
      val a = base.select(col("vec_id").as("a_id"), col("label"),
        col("qv").as("qa"), col("norm2").as("a_norm2"))
      val b = base.select(col("vec_id").as("b_id"), col("label").as("b_label"),
        col("qv").as("qb"), col("norm2").as("b_norm2"))
      a.join(b, col("label") === col("b_label") && col("a_id") < col("b_id"))
        .withColumn("dot", dot_long(col("qa"), col("qb")))
        .withColumn("cos", expr(
          "CAST(dot AS DOUBLE) / (sqrt(CAST(a_norm2 AS DOUBLE)) * sqrt(CAST(b_norm2 AS DOUBLE)))"))
        .filter(col("cos") >= 0.3)
        .select(col("a_id"), col("b_id"), col("cos"))
        .orderBy(col("a_id"), col("b_id"))
    })
}
