package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. These are the dedup family a large
  * training-data pipeline needs at 100 TB.
  *
  * Scale design: every variant is shuffle-on-key with uniform keys —
  *  - exact: hash-groupBy on the content digest;
  *  - MinHash: shingle explode → per-doc signature (map-side partial
  *    min), LSH bucket = the signature itself, dup groups via window
  *    over signature (the bucket-join never materializes O(n²) pairs);
  *  - SimHash: token explode → 16 bit-vote aggregates per doc;
  *  - Jaccard: candidate pairs restricted to (lang, source) blocks so
  *    the self-join is block-local (in production the block key is the
  *    LSH band — same shape).
  * No driver-side loops; everything is a DataFrame plan.
  */
object DedupOps {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** 4-permutation MinHash over 8-char shingles. Hash h_i(s) =
    * md5(i || s); the minimum per doc is an order statistic of a
    * uniform hash — the standard MinHash construction, engine-portable
    * because md5 is identical everywhere.
    */
  private def minhashSig(s: SparkSession, dir: String): DataFrame = {
    val shingles = docs(s, dir)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, length(text)-7), i -> substring(text, i, 8))")).as("s"))
    shingles.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("0"), col("s")))).as("m0"),
      min(md5(concat(lit("1"), col("s")))).as("m1"),
      min(md5(concat(lit("2"), col("s")))).as("m2"),
      min(md5(concat(lit("3"), col("s")))).as("m3"))
  }

  private val minhashSigSql =
    """SELECT doc_id,
      |  min(md5('0' || s)) AS m0, min(md5('1' || s)) AS m1,
      |  min(md5('2' || s)) AS m2, min(md5('3' || s)) AS m3
      |FROM (
      |  SELECT doc_id, substr(text, i, 8) AS s
      |  FROM documents,
      |    LATERAL (SELECT unnest(generate_series(1, length(text)-7)) AS i) g
      |  WHERE length(text) >= 8)
      |GROUP BY doc_id""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    // Exact dedup: hash-groupBy on content digest; every doc mapped to
    // the canonical (minimum) doc_id of its content group.
    QuerySpec.sql(
      "dedup_exact",
      """SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS keep_id
        |FROM (SELECT doc_id, md5(lower(text)) AS fp FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val fp = docs(s, dir).select(col("doc_id"), md5(lower(col("text"))).as("fp"))
      fp.withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .orderBy(col("doc_id"))
    },

    // MinHash + LSH dedup: signature per doc; docs sharing the full
    // 4-hash signature land in one LSH bucket; canonical id per bucket.
    QuerySpec.sql(
      "dedup_minhash_lsh",
      s"""SELECT doc_id, m0, m1, m2, m3,
         |  MIN(doc_id) OVER (PARTITION BY m0, m1, m2, m3) AS keep_id
         |FROM ($minhashSigSql)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      minhashSig(s, dir)
        .withColumn("keep_id",
          min(col("doc_id")).over(
            Window.partitionBy(col("m0"), col("m1"), col("m2"), col("m3"))))
        .orderBy(col("doc_id"))
    },

    // SimHash (16-bit): per-token 16-bit hash from the md5 prefix,
    // ±1 votes per bit position, sign → fingerprint bit.
    QuerySpec.sql(
      "dedup_simhash",
      """SELECT doc_id,
        |  CAST(SUM(CASE WHEN vote > 0 THEN CAST(POW(2, j) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS simhash
        |FROM (
        |  SELECT doc_id, j,
        |    SUM(2 * (CAST(FLOOR(v / POW(2, j)) AS BIGINT) % 2) - 1) AS vote
        |  FROM (
        |    SELECT doc_id,
        |      (strpos('0123456789abcdef', substr(md5(tok),1,1))-1)*4096
        |    + (strpos('0123456789abcdef', substr(md5(tok),2,1))-1)*256
        |    + (strpos('0123456789abcdef', substr(md5(tok),3,1))-1)*16
        |    + (strpos('0123456789abcdef', substr(md5(tok),4,1))-1) AS v
        |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |          FROM documents)),
        |    LATERAL (SELECT unnest(generate_series(0, 15)) AS j) js
        |  GROUP BY doc_id, j)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val tv = toks.select(col("doc_id"), expr(
        """(instr('0123456789abcdef', substr(md5(tok),1,1))-1)*4096
          |+ (instr('0123456789abcdef', substr(md5(tok),2,1))-1)*256
          |+ (instr('0123456789abcdef', substr(md5(tok),3,1))-1)*16
          |+ (instr('0123456789abcdef', substr(md5(tok),4,1))-1)""".stripMargin).as("v"))
      val votes = tv
        .select(col("doc_id"), col("v"), explode(expr("sequence(0, 15)")).as("j"))
        .groupBy(col("doc_id"), col("j"))
        .agg(sum(expr("2 * (CAST(FLOOR(v / POW(2, j)) AS BIGINT) % 2) - 1")).as("vote"))
      votes.groupBy(col("doc_id"))
        .agg(sum(expr("CASE WHEN vote > 0 THEN CAST(POW(2, j) AS BIGINT) ELSE 0 END"))
          .cast("long").as("simhash"))
        .orderBy(col("doc_id"))
    },

    // Banded MinHash-LSH: 4 hashes → 2 bands of 2; docs sharing ANY
    // band signature become candidate pairs (the classic b×r banding
    // that catches near-dups a full-signature match misses), scored by
    // the fraction of matching minhashes (Jaccard estimator).
    QuerySpec.sql(
      "dedup_minhash_banded",
      s"""WITH sig AS ($minhashSigSql),
         |bands AS (
         |  SELECT doc_id, 1 AS band, m0 || '|' || m1 AS key FROM sig
         |  UNION ALL
         |  SELECT doc_id, 2 AS band, m2 || '|' || m3 AS key FROM sig),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT c.a_id, c.b_id,
         |  CAST((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END
         |      + CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END
         |      + CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END
         |      + CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END) AS DOUBLE) / 4
         |    AS est_jaccard
         |FROM cand c
         |JOIN sig sa ON sa.doc_id = c.a_id
         |JOIN sig sb ON sb.doc_id = c.b_id
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val sig = minhashSig(s, dir)
      val bands = sig.select(col("doc_id"), lit(1).as("band"),
          concat_ws("|", col("m0"), col("m1")).as("key"))
        .unionByName(sig.select(col("doc_id"), lit(2).as("band"),
          concat_ws("|", col("m2"), col("m3")).as("key")))
      val cand = bands.as("a")
        .join(bands.select(col("doc_id").as("b_id"), col("band").as("b_band"),
          col("key").as("b_key")),
          col("band") === col("b_band") && col("key") === col("b_key") &&
            col("doc_id") < col("b_id"))
        .select(col("doc_id").as("a_id"), col("b_id"))
        .dropDuplicates()
      val sa = sig.select(col("doc_id").as("a_id"), col("m0").as("a0"),
        col("m1").as("a1"), col("m2").as("a2"), col("m3").as("a3"))
      val sb = sig.select(col("doc_id").as("b_id"), col("m0").as("b0"),
        col("m1").as("b1"), col("m2").as("b2"), col("m3").as("b3"))
      cand.join(sa, Seq("a_id")).join(sb, Seq("b_id"))
        .withColumn("est_jaccard",
          ((when(col("a0") === col("b0"), 1).otherwise(0)
            + when(col("a1") === col("b1"), 1).otherwise(0)
            + when(col("a2") === col("b2"), 1).otherwise(0)
            + when(col("a3") === col("b3"), 1).otherwise(0)).cast("double") / 4))
        .select(col("a_id"), col("b_id"), col("est_jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // N-gram Jaccard near-dup: distinct word-3-gram sets, candidate
    // pairs within (lang, source) blocks, |A∩B| / |A∪B| ≥ 0.02.
    QuerySpec.sql(
      "dedup_ngram_jaccard",
      """WITH toks AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS ts
        |  FROM documents),
        |ngrams AS (
        |  SELECT DISTINCT doc_id, lang, source,
        |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS ng
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
        |  WHERE len(ts) >= 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM ngrams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
        |  FROM ngrams a JOIN ngrams b
        |    ON a.ng = b.ng AND a.lang = b.lang AND a.source = b.source
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, n_inter,
        |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = a_id
        |JOIN sizes sb ON sb.doc_id = b_id
        |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.02
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val ngrams = docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(expr(
            """transform(sequence(1, size(ts)-2),
              |  i -> concat(element_at(ts, i), ' ', element_at(ts, i+1),
              |              ' ', element_at(ts, i+2)))""".stripMargin)).as("ng"))
        .dropDuplicates("doc_id", "ng")
      val sizes = ngrams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = ngrams.select(col("doc_id").as("a_id"), col("lang"), col("source"), col("ng"))
      val b = ngrams.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("source").as("b_source"), col("ng").as("b_ng"))
      val inter = a.join(b,
          col("ng") === col("b_ng") && col("lang") === col("b_lang") &&
            col("source") === col("b_source") && col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
        .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")))
        .filter(col("jaccard") >= 0.02)
        .select(col("a_id"), col("b_id"), col("n_inter"), col("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    })
}
