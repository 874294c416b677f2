package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.JaroSim
import graft.plans.TopKPerKey
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution / fuzzy record matching over the `part` name
  * dictionary — the canonicalization pass a large-scale ingest
  * pipeline runs to merge near-identical surface forms (vendor names,
  * product titles, author strings) before joining facts on them.
  *
  * The scale discipline is dictionary-first: resolution runs over
  * DISTINCT values (with row-support counts carried along), never over
  * raw rows — the distinct-name table is orders of magnitude smaller
  * than the fact table and bounded by the vocabulary, not the corpus
  * (64 names for `part` at every SF; real catalogs are ~10^5-10^7,
  * still broadcastable or block-joinable). Candidate generation is
  * BLOCKED (same trailing token), so the pair surface is Σ block²
  * over dictionary blocks — the same bounded-block shape as the
  * MinHash/LSH dedup family, never dictionary².
  *
  * Scoring: Spark's codegen'd `levenshtein` for the integer-distance
  * gate; the native [[JaroSim]] / [[JaroWinklerSim]] codegen
  * expressions (bit-exact with the DuckDB oracle's
  * jaro_winkler_similarity) for the similarity gates.
  */
object EntityOps {

  /** Distinct-name dictionary with blocking key (trailing token) and
    * row-support count. At scale this is the groupBy-compressed value
    * dictionary — the only thing the pair join ever touches.
    */
  private def dict(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("blk", element_at(split(col("name"), " "), -1))

  private val dictSql =
    """SELECT p_name AS name, COUNT(*) AS n,
      |  split_part(p_name, ' ', -1) AS blk
      |FROM part GROUP BY 1""".stripMargin

  def specs: Seq[QuerySpec] = Seq(

    // Blocking-RECALL evaluation — the ER discipline the recall gates
    // give the ANN indexes: of the true fuzzy matches (lev ≤ 3), what
    // fraction does the trailing-token blocking key actually let
    // meet? Ground truth is ALL pairs of the name DICTIONARY — the
    // groupBy-compressed value domain (~64 names here), so the
    // quadratic truth is over the compressed domain, never the fact
    // rows; a domain too large for that gets the deterministic
    // hash-sample treatment instead. Broken out by edit distance: a
    // blocker that loses distance-3 matches but keeps distance-1s
    // shows exactly that here.
    QuerySpec.sql(
      "er_blocking_recall",
      s"""WITH d AS ($dictSql),
         |truth AS (
         |  SELECT CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
         |    a.blk = b.blk AS caught
         |  FROM d a JOIN d b ON a.name < b.name
         |  WHERE levenshtein(a.name, b.name) <= 3)
         |SELECT dist,
         |  CAST(COUNT(*) AS BIGINT) AS n_truth,
         |  CAST(COALESCE(SUM(CASE WHEN caught THEN 1 END), 0) AS BIGINT)
         |    AS n_caught,
         |  CAST(COALESCE(SUM(CASE WHEN caught THEN 1 END), 0) * 1000000
         |    // COUNT(*) AS BIGINT) AS recall_ppm
         |FROM truth GROUP BY 1
         |ORDER BY dist""".stripMargin) { (s, dir) =>
      val d = dict(s, dir)
      val a = d.select(col("name").as("a"), col("blk").as("ba"))
      val b = d.select(col("name").as("b"), col("blk").as("bb"))
      a.join(broadcast(b), col("a") < col("b"))
        .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
        .filter(col("dist") <= 3)
        .withColumn("caught", col("ba") === col("bb"))
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_truth"),
          coalesce(sum(when(col("caught"), 1L)), lit(0L)).as("n_caught"),
          expr("CAST(COALESCE(SUM(CASE WHEN caught THEN 1L END), 0)" +
            " * 1000000 div COUNT(*) AS BIGINT)").as("recall_ppm"))
        .orderBy(col("dist"))
    },

    // Blocked fuzzy pairs, integer edit distance: candidate pairs from
    // the blocking join, kept when levenshtein ≤ 3 (same both engines,
    // integer-safe — no float hash risk). Support counts quantify how
    // many fact rows each merge decision touches.
    QuerySpec.sql(
      "er_blocked_pairs",
      s"""WITH d AS ($dictSql)
         |SELECT a.name AS a_name, b.name AS b_name,
         |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
         |  a.n AS a_n, b.n AS b_n
         |FROM d a JOIN d b ON a.blk = b.blk AND a.name < b.name
         |WHERE levenshtein(a.name, b.name) <= 3
         |ORDER BY a_name, b_name""".stripMargin) { (s, dir) =>
      val d = dict(s, dir)
      val a = d.select(col("name").as("a_name"), col("n").as("a_n"), col("blk"))
      val b = d.select(col("name").as("b_name"), col("n").as("b_n"), col("blk"))
      a.join(broadcast(b), Seq("blk"))
        .filter(col("a_name") < col("b_name"))
        .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
        .filter(col("dist") <= 3)
        .select(col("a_name"), col("b_name"), col("dist"),
          col("a_n"), col("b_n"))
        .orderBy(col("a_name"), col("b_name"))
    },

    // Blocked fuzzy pairs, Jaro-Winkler: the similarity spelling of
    // the same blocked join through the native codegen expression.
    // The jw column is a raw double — bit-exact with the oracle's
    // jaro_winkler_similarity by construction (see JaroSim), so the
    // threshold cut agrees too.
    QuerySpec.sql(
      "er_jw_match",
      s"""WITH d AS ($dictSql)
         |SELECT a.name AS a_name, b.name AS b_name,
         |  jaro_winkler_similarity(a.name, b.name) AS jw,
         |  a.n AS a_n, b.n AS b_n
         |FROM d a JOIN d b ON a.blk = b.blk AND a.name < b.name
         |WHERE jaro_winkler_similarity(a.name, b.name) >= 0.8
         |ORDER BY a_name, b_name""".stripMargin) { (s, dir) =>
      val d = dict(s, dir)
      val a = d.select(col("name").as("a_name"), col("n").as("a_n"), col("blk"))
      val b = d.select(col("name").as("b_name"), col("n").as("b_n"), col("blk"))
      a.join(broadcast(b), Seq("blk"))
        .filter(col("a_name") < col("b_name"))
        .withColumn("jw", JaroSim.jaroWinkler(col("a_name"), col("b_name")))
        .filter(col("jw") >= 0.8)
        .select(col("a_name"), col("b_name"), col("jw"), col("a_n"), col("b_n"))
        .orderBy(col("a_name"), col("b_name"))
    },

    // Character-bigram Dice similarity over the same blocked pairs —
    // the SET-based matcher beside the edit-based Jaro-Winkler (Dice
    // is insensitive to token order, JW to local transpositions; real
    // ER stacks score both and let the threshold model arbitrate).
    // Bigram sets build per ROW (a transform over the name's char
    // positions + distinct — no explode, names are bounded strings),
    // the intersection is a per-pair array op, and the score is one
    // exact ppm division: 2|A∩B|·10⁶ // (|A|+|B|). Same broadcast
    // value-domain block join as er_jw_match. Names shorter than 2
    // chars are filtered in BOTH engines: Spark's sequence(1, 0)
    // defaults to step −1 and yields [1, 0] (one bogus gram) where
    // DuckDB's generate_series(1, 0) is empty — the filter keeps the
    // gram domain identical (and a 1-char name has no bigrams anyway).
    QuerySpec.sql(
      "er_qgram_dice",
      s"""WITH d AS ($dictSql),
         |g AS (SELECT name, blk,
         |    list_distinct(list_transform(
         |      generate_series(1, length(name) - 1),
         |      i -> name[i:i+1])) AS grams
         |  FROM d WHERE length(name) >= 2)
         |SELECT a.name AS a_name, b.name AS b_name,
         |  CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT)
         |    AS n_common,
         |  CAST(len(a.grams) AS BIGINT) AS a_grams,
         |  CAST(len(b.grams) AS BIGINT) AS b_grams,
         |  CAST(2 * len(list_intersect(a.grams, b.grams)) * 1000000
         |    // (len(a.grams) + len(b.grams)) AS BIGINT) AS dice_ppm
         |FROM g a JOIN g b ON a.blk = b.blk AND a.name < b.name
         |WHERE 2 * len(list_intersect(a.grams, b.grams)) * 1000000
         |  // (len(a.grams) + len(b.grams)) >= 400000
         |ORDER BY a_name, b_name""".stripMargin) { (s, dir) =>
      val g = dict(s, dir)
        .filter(length(col("name")) >= 2)
        .select(col("name"), col("blk"),
          array_distinct(expr(
            "transform(sequence(1, length(name) - 1), " +
              "i -> substring(name, i, 2))")).as("grams"))
      val a = g.select(col("name").as("a_name"),
        col("grams").as("a_g"), col("blk"))
      val b = g.select(col("name").as("b_name"),
        col("grams").as("b_g"), col("blk"))
      a.join(broadcast(b), Seq("blk"))
        .filter(col("a_name") < col("b_name"))
        .select(col("a_name"), col("b_name"),
          size(array_intersect(col("a_g"), col("b_g"))).cast("long")
            .as("n_common"),
          size(col("a_g")).cast("long").as("a_grams"),
          size(col("b_g")).cast("long").as("b_grams"))
        .withColumn("dice_ppm",
          expr("CAST(2 * n_common * 1000000 " +
            "div (a_grams + b_grams) AS BIGINT)"))
        .filter(col("dice_ppm") >= 400000)
        .orderBy(col("a_name"), col("b_name"))
    },

    // Match-threshold sweep — the calibration curve an ER engineer
    // reads before fixing the JW cutoff (the er counterpart of
    // dedup_threshold_sweep): candidate-pair yield at every threshold
    // from 0.750 to 1.000. The pair surface is the same blocked
    // value-domain self-join as er_jw_match; the 11-threshold grid
    // multiplies the SCORED PAIRS table, never the source rows, and
    // the float compare jw ≥ t/1000 uses the identical literal in both
    // engines over bit-identical JW scores.
    QuerySpec.sql(
      "er_match_threshold_sweep",
      s"""WITH d AS ($dictSql),
         |p AS (
         |  SELECT jaro_winkler_similarity(a.name, b.name) AS jw
         |  FROM d a JOIN d b ON a.blk = b.blk AND a.name < b.name),
         |g AS (SELECT UNNEST(range(750, 1001, 25)) AS t_pm)
         |SELECT CAST(t_pm AS BIGINT) AS t_pm,
         |  CAST(COALESCE(SUM(CASE WHEN jw >= CAST(t_pm AS DOUBLE) / 1000
         |    THEN 1 END), 0) AS BIGINT) AS n_pairs
         |FROM g CROSS JOIN p
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val d = dict(s, dir)
      val a = d.select(col("name").as("a_name"), col("blk"))
      val b = d.select(col("name").as("b_name"), col("blk"))
      val p = a.join(broadcast(b), Seq("blk"))
        .filter(col("a_name") < col("b_name"))
        .select(JaroSim.jaroWinkler(col("a_name"), col("b_name")).as("jw"))
      s.range(750, 1001, 25).select(col("id").as("t_pm"))
        .crossJoin(broadcast(p))
        .groupBy(col("t_pm"))
        .agg(coalesce(sum(when(
            expr("jw >= CAST(t_pm AS DOUBLE) / 1000"), 1L)), lit(0L))
          .as("n_pairs"))
        .orderBy(col("t_pm"))
    },

    // Best-match resolution: every dictionary entry's single closest
    // other entry by Jaro-Winkler — the assignment step that picks a
    // canonical form per cluster seed. Top-1 per name goes through the
    // custom TopKPerKey plan (map-side heap reduce, no WindowExec);
    // the oracle spells the same pick as ROW_NUMBER() = 1 with the
    // identical (jw DESC, name) tie order.
    QuerySpec.sql(
      "er_best_match",
      s"""WITH d AS ($dictSql),
         |scored AS (
         |  SELECT a.name AS a_name, b.name AS best_name,
         |    jaro_winkler_similarity(a.name, b.name) AS jw
         |  FROM d a JOIN d b ON a.name <> b.name)
         |SELECT a_name, best_name, jw FROM (
         |  SELECT a_name, best_name, jw,
         |    ROW_NUMBER() OVER (PARTITION BY a_name
         |      ORDER BY jw DESC, best_name) AS rn
         |  FROM scored)
         |WHERE rn = 1
         |ORDER BY a_name""".stripMargin) { (s, dir) =>
      val d = dict(s, dir).select(col("name"))
      val scored = d.select(col("name").as("a_name"))
        .crossJoin(broadcast(d.select(col("name").as("best_name"))))
        .filter(col("a_name") =!= col("best_name"))
        .withColumn("jw", JaroSim.jaroWinkler(col("a_name"), col("best_name")))
      TopKPerKey.topKRanked(scored, Seq("a_name"),
          Seq("jw" -> true, "best_name" -> false), 1, "rn")
        .select(col("a_name"), col("best_name"), col("jw"))
        .orderBy(col("a_name"))
    },

    // Entity clustering: transitive closure of the blocked fuzzy
    // matches — a↔b and b↔c merge into one entity even when a↔c
    // exceeds the edit threshold (the reason record linkage needs
    // components, not pairs). Reuses the ConnectedComponents
    // machinery (edge-touched subgraph, O(diameter) rounds) over the
    // dictionary. Names get ORDER-ISOMORPHIC dense ids without any
    // single-task window: binary string order groups by first byte,
    // so row_number inside the first-char partition plus a broadcast
    // cumulative offset per prefix (≤ alphabet rows through the
    // driver — the k-center/centroid discipline) reproduces the
    // global name rank exactly; the numeric min-label is then the
    // alphabetically-least member, which the oracle spells directly
    // as MIN(name) over the recursive closure.
    QuerySpec.sql(
      "er_entity_clusters",
      s"""WITH RECURSIVE d AS ($dictSql),
         |cand AS (
         |  SELECT a.name AS a, b.name AS b
         |  FROM d a JOIN d b ON a.blk = b.blk AND a.name < b.name
         |  WHERE levenshtein(a.name, b.name) <= 3),
         |edges AS (
         |  SELECT a AS u, b AS v FROM cand
         |  UNION ALL SELECT b, a FROM cand),
         |reach AS (
         |  SELECT name AS id, name AS r FROM d
         |  UNION
         |  SELECT re.id, e.v FROM reach re JOIN edges e ON e.u = re.r)
         |SELECT id AS name, MIN(r) AS entity
         |FROM reach GROUP BY id
         |ORDER BY name""".stripMargin) { (s, dir) =>
      entityClusters(s, dir).orderBy(col("name"))
    },

    // Golden-record survivorship: one canonical record per resolved
    // entity — the post-clustering merge step every MDM/ER pipeline
    // ends with. Canonical surface form = the most-supported variant
    // (ties to the lexicographically smallest, via min_by over a
    // (−support, name) struct — deterministic in both engines);
    // attribute spread (price min/max) aggregates across all cluster
    // members. Two hash aggregates over the fact ⋈ broadcast(label)
    // join; the dictionary-first discipline keeps every ER stage
    // vocabulary-bounded.
    QuerySpec.sql(
      "er_golden_record",
      s"""WITH RECURSIVE d AS ($dictSql),
         |cand AS (
         |  SELECT a.name AS a, b.name AS b
         |  FROM d a JOIN d b ON a.blk = b.blk AND a.name < b.name
         |  WHERE levenshtein(a.name, b.name) <= 3),
         |edges AS (
         |  SELECT a AS u, b AS v FROM cand
         |  UNION ALL SELECT b, a FROM cand),
         |reach AS (
         |  SELECT name AS id, name AS r FROM d
         |  UNION
         |  SELECT re.id, e.v FROM reach re JOIN edges e ON e.u = re.r),
         |cl AS (SELECT id AS name, MIN(r) AS entity FROM reach GROUP BY id),
         |j AS (SELECT cl.entity, p.p_name, p.p_retailprice
         |  FROM part p JOIN cl ON cl.name = p.p_name),
         |sup AS (SELECT entity, p_name, COUNT(*) AS n
         |  FROM j GROUP BY 1, 2),
         |canon AS (SELECT entity, p_name AS canonical FROM (
         |  SELECT entity, p_name,
         |    ROW_NUMBER() OVER (PARTITION BY entity
         |      ORDER BY n DESC, p_name) AS rn
         |  FROM sup) r WHERE rn = 1)
         |SELECT j.entity, canon.canonical,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(DISTINCT j.p_name) AS BIGINT) AS n_variants,
         |  MIN(j.p_retailprice) AS price_min,
         |  MAX(j.p_retailprice) AS price_max
         |FROM j JOIN canon ON canon.entity = j.entity
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
      val cl = entityClusters(s, dir)
      val j = Tables(s, dir, "part")
        .join(broadcast(cl), col("p_name") === col("name"))
        .select(col("entity"), col("p_name"), col("p_retailprice"))
      val sup = j.groupBy(col("entity"), col("p_name"))
        .agg(count(lit(1)).as("n"))
      val canon = sup.groupBy(col("entity"))
        .agg(min_by(col("p_name"),
          struct((col("n") * -1).as("nn"), col("p_name"))).as("canonical"))
      j.join(broadcast(canon), Seq("entity"))
        .groupBy(col("entity"), col("canonical"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("p_name")).as("n_variants"),
          min(col("p_retailprice")).as("price_min"),
          max(col("p_retailprice")).as("price_max"))
        .orderBy(col("entity"))
    },

    // Phonetic blocking evaluation — a second, SOUND-based blocking
    // key (simplified Soundex: first letter + the first three
    // collapsed consonant classes, built from ONE shared
    // translate/regexp chain in the RE2 ∩ Java-regex subset — no
    // backreferences, so both engines compile it) evaluated head-to-
    // head against the trailing-token key on the same lev ≤ 3 ground
    // truth as er_blocking_recall. Phonetic keys are coarser, so they
    // catch typo'd matches token equality misses — the recall
    // trade-off every blocking design weighs. Plan: the same
    // broadcast dictionary² truth join (dictionary-bounded, never
    // corpus²); the key itself is a per-row expression.
    QuerySpec.sql(
      "er_phonetic_blocking",
      s"""WITH d AS ($dictSql),
         |p AS (SELECT name, blk, n, ${phoneticSql("blk")} AS pk
         |  FROM d),
         |truth AS (
         |  SELECT CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
         |    a.blk = b.blk AS tok_caught,
         |    a.pk = b.pk AS ph_caught
         |  FROM p a JOIN p b ON a.name < b.name
         |  WHERE levenshtein(a.name, b.name) <= 3)
         |SELECT dist,
         |  CAST(COUNT(*) AS BIGINT) AS n_truth,
         |  CAST(COALESCE(SUM(CASE WHEN tok_caught THEN 1 END), 0)
         |    AS BIGINT) AS n_tok,
         |  CAST(COALESCE(SUM(CASE WHEN ph_caught THEN 1 END), 0)
         |    AS BIGINT) AS n_ph,
         |  CAST(COALESCE(SUM(CASE WHEN tok_caught THEN 1 END), 0)
         |    * 1000000 // COUNT(*) AS BIGINT) AS tok_recall_ppm,
         |  CAST(COALESCE(SUM(CASE WHEN ph_caught THEN 1 END), 0)
         |    * 1000000 // COUNT(*) AS BIGINT) AS ph_recall_ppm
         |FROM truth GROUP BY 1
         |ORDER BY dist""".stripMargin) { (s, dir) =>
      val d = dict(s, dir).withColumn("pk", expr(phoneticSql("blk")))
      val a = d.select(col("name").as("a"), col("blk").as("ba"),
        col("pk").as("pa"))
      val b = d.select(col("name").as("b"), col("blk").as("bb"),
        col("pk").as("pb"))
      a.join(broadcast(b), col("a") < col("b"))
        .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
        .filter(col("dist") <= 3)
        .withColumn("tok_caught", col("ba") === col("bb"))
        .withColumn("ph_caught", col("pa") === col("pb"))
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_truth"),
          coalesce(sum(when(col("tok_caught"), 1L)), lit(0L))
            .as("n_tok"),
          coalesce(sum(when(col("ph_caught"), 1L)), lit(0L))
            .as("n_ph"),
          expr("CAST(COALESCE(SUM(CASE WHEN tok_caught THEN 1L END)," +
            " 0) * 1000000 div COUNT(*) AS BIGINT)")
            .as("tok_recall_ppm"),
          expr("CAST(COALESCE(SUM(CASE WHEN ph_caught THEN 1L END)," +
            " 0) * 1000000 div COUNT(*) AS BIGINT)")
            .as("ph_recall_ppm"))
        .orderBy(col("dist"))
    })

  /** Simplified-Soundex SQL expression over a word column — ONE text
    * compiled by BOTH engines: translate to consonant-class digits,
    * collapse adjacent duplicates with plain replace('dd','d')
    * passes (four per digit — enough for any run in a ≤16-char
    * token; regexp_replace is out because DuckDB's is first-match
    * while Spark's is global), then first letter + the first three
    * nonzero codes, zero-padded. Differs from full Soundex only in
    * the H/W separator rule — irrelevant here because both sides
    * share this exact definition.
    */
  private def phoneticSql(c: String): String = {
    val digits = s"translate(upper($c), " +
      "'AEIOUYHWBFPVCGJKQSXZDTLMNR', '00000000111122222222334556')"
    val collapsed = (0 to 6).foldLeft(digits) { (acc, d) =>
      (1 to 4).foldLeft(acc)((a, _) => s"replace($a, '$d$d', '$d')")
    }
    s"substr(upper($c), 1, 1) || " +
      s"rpad(substr(replace(substr($collapsed, 2), '0', ''), 1, 3), " +
      "3, '0')"
  }

  /** The resolved (name, entity) label table — the shared body of
    * `er_entity_clusters` and `er_golden_record`: blocked candidate
    * edges under the levenshtein gate, min-label connected components
    * over the dictionary (dictionary-sized: no cache needed).
    */
  /** Memoized (session, dir) cluster-label table: the blocked-match +
    * min-label-CC body is consumed by three plan branches of
    * er_golden_record AND by er_entity_clusters — without the memo the
    * optimizer re-expands the dict scan + index window + CC fixpoint
    * once per reference (measured 3× in the physical plan). At
    * warehouse scale this is the write-once `entity_labels` table.
    * Released by [[releaseCaches]] after the entity section.
    */
  private val clusterMemo = new graft.functions.DataFrameMemo

  private[graft] def releaseCaches(s: SparkSession, dir: String): Unit =
    clusterMemo.clear(Some(s))

  private def entityClusters(s: SparkSession, dir: String): DataFrame =
    clusterMemo.getOrBuild(s, dir)(
      graft.functions.Materialize.stable(entityClustersBody(s, dir)))

  private def entityClustersBody(s: SparkSession, dir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val d = dict(s, dir)
      val base = d.select(col("name"), col("blk"))
        .withColumn("pfx", substring(col("name"), 1, 1))
      var acc = 0L
      val offRows = base.groupBy(col("pfx")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1)
        .map { case (p, c) => val o = (p, acc); acc += c; o }
      val offs = broadcast(
        s.createDataFrame(offRows.toSeq).toDF("pfx", "off"))
      val idx = base
        .withColumn("rn", row_number()
          .over(Window.partitionBy(col("pfx")).orderBy(col("name"))))
        .join(offs, Seq("pfx"))
        .withColumn("idx", (col("off") + col("rn")).cast("long"))
        .select(col("name"), col("blk"), col("idx"))
      val a = idx.select(col("name").as("a_name"), col("idx").as("u"),
        col("blk"))
      val b = idx.select(col("name").as("b_name"), col("idx").as("v"),
        col("blk"))
      val edges = a.join(broadcast(b), Seq("blk"))
        .filter(col("a_name") < col("b_name") &&
          levenshtein(col("a_name"), col("b_name")) <= 3)
        .select(col("u"), col("v"))
      val labels = graft.functions.ConnectedComponents.minLabels(
        idx.select(col("idx")), "idx", edges, "u", "v")
      labels
        .join(idx.select(col("idx"), col("name")), Seq("idx"))
        .join(broadcast(idx.select(col("idx").as("label"),
          col("name").as("entity"))), Seq("label"))
        .select(col("name"), col("entity"))
  }
}
