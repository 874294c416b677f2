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

  /** MinHash parameters: `NumHashes` permutations split into
    * `NumBands` bands of `NumHashes / NumBands` rows — the standard
    * b×r trade-off (more bands → higher recall, bigger candidate set).
    * The oracle SQL is generated from the same parameters, so changing
    * them keeps Spark and DuckDB in lockstep. Defaults (4, 2) preserve
    * the original gate semantics.
    */
  val NumHashes = 4
  val NumBands = 2
  require(NumHashes % NumBands == 0, "bands must evenly split the hashes")

  /** Triangle-decomposition block size for band-bucket candidate
    * generation ([[graft.functions.Pairs.blockedSelfPairs]]): a
    * degenerate band value (e.g. near-empty docs hashing alike) would
    * otherwise compute O(bucket²) pairs in one task; blocking spreads
    * them across tasks with NO truncation.
    */
  val MaxBandBucket = 100000

  /** HARD stop-phrase ceiling for the n-gram Jaccard path: no posting
    * list in the pair join ever exceeds this, whatever the corpus.
    * Since r15 it is the upper clamp of an ADAPTIVE per-block ceiling
    * (see [[MinNgramDf]] / [[NgramDfQuantilePermyriad]]): the r14
    * measurement showed a fixed 1000 cannot engage below n ≈ 256k on
    * a natural 30k-word vocabulary (hottest per-block df ~350 at
    * n = 64k), leaving the operator ×15.7-per-×4 — near-quadratic —
    * in exactly the regime real corpora occupy.
    *
    * ROUTING RULE (measured, SCALING.md "Vocabulary-skew knob" V=60
    * table, r16): when a corpus is DEGENERATE — its per-block P99.9
    * df caps sit an order of magnitude-plus above the MinNgramDf=16
    * floor (47–66 / 121–179 / 328–467 at n = 4k/16k/64k on the V=60
    * knob, vs 16 on the natural 30k-word corpus through n = 256k) —
    * the df-driven families (ngram-jaccard, tfidf-cosine,
    * containment-by-grams) are measuring the corpus's degeneracy,
    * not near-duplication: their adaptive surface still grows
    * ×12–13 per ×4 there. Route that regime to
    * `dedup_minhash_banded` / `dedup_containment`: at the same V=60
    * corpus the banded candidate surface is ×13.7–21.7 SMALLER at
    * every measured n (6.46M vs 88.2M at n = 64k). Honest caveat,
    * measured in the same row: banded's own V=60 growth is
    * ×17.0/×15.8 per ×4 — in a fully degenerate corpus both
    * families trend near-quadratic, so the routing win is the
    * absolute surface gap (plus cheaper per-candidate verification
    * and MaxBandBucket triangle-blocking), not a complexity-class
    * change. */
  val MaxNgramDf = 1000

  /** FLOOR of the adaptive n-gram df ceiling: a block's ceiling never
    * drops below this, so low-skew corpora (the driver testdata's max
    * df is 4) are NEVER pruned — the adaptive rule only engages where
    * skew exists. */
  val MinNgramDf = 16

  /** The adaptive ceiling's df-quantile, in permyriad (per-10000) of
    * a block's DISTINCT grams: a block's ceiling is the smallest df d
    * with (# grams with df ≤ d) · 10000 ≥ 999·10 · (# grams), clamped
    * to [[[MinNgramDf]], [[MaxNgramDf]]] — i.e. the top 0.1% most-
    * shared grams are stop phrases (conservative by text-dedup
    * standards; near-dup pairs are identified by their RARE shared
    * grams, and the measured true-pair retention under this rule is
    * 97–99.6% at n = 16k–64k). Why a quantile of DISTINCT grams
    * bends the growth curve where fixed-1000 could not: on a zipfian
    * corpus the hot head is a vanishing fraction of distinct grams
    * (# grams with df ≥ d grows ~n/d while distinct grams grow ~n),
    * so the quantile cap grows SUBLINEARLY in n (~n^0.35 measured:
    * P99.9 df = 3–4 / 5–6 / 7–10 / 11–14 at n = 4k/16k/64k/256k —
    * the 256k point, added r16, lands inside the extrapolation's
    * predicted 11–16 band, with the MinNgramDf floor still binding
    * there and the handover still on course for n ≈ 512k) and the
    * measured DISTINCT candidate growth bends from the fixed rule's
    * ×15.7 per ×4 corpus to ×7.4 at 16k→64k and ×6.3 at 64k→256k
    * (SCALING.md "quantile takeover" table — the ≤ ×8-per-×4 bar
    * holds through the approach to the handover). 9990 rather than
    * 9999: the 0.01% variant measured ×10.8 — the hot head below its
    * quantile still carried most of the C(df,2) mass. */
  val NgramDfQuantilePermyriad = 9990

  /** Edit-distance ceiling for the levenshtein verification gate: a
    * candidate pair is a character-level near-dup when the distance
    * over the normalized text is ≤ this. Also the band width of the
    * bounded-DP levenshtein and the length-gap prefilter. */
  val EditMax = 64

  /** Minimum normalized length (chars) for a line to participate in
    * line-level dedup — shorter lines ("Yes.", headers, boilerplate
    * fragments) are always kept, the C4 discipline that stops the
    * dedup from eating every short common sentence. */
  val MinLineLen = 16

  /** Words per grid line for line-level dedup: corpora without
    * reliable newline/sentence boundaries (and this fixture) are cut
    * into consecutive [[LineWords]]-word windows — the boundary-free
    * equivalent of C4's line split; a repeated span is caught when it
    * covers an aligned window in both documents. */
  val LineWords = 8

  private def mcols: Seq[String] = (0 until NumHashes).map(i => s"m$i")

  /** n-permutation MinHash over 8-char shingles. Permutation i is the
    * i%4-th 8-hex-char slice of md5(i/4 || s) — independent uniform
    * 32-bit hashes at a quarter of the digest cost (one md5 serves
    * four permutations), and the minimum per doc is the standard
    * MinHash order statistic. Engine-portable because md5 and substr
    * are identical everywhere.
    *
    * The signature is computed by the codegen'd
    * [[graft.functions.MinHashSig]] expression — a per-document tight
    * loop producing identical values to the declarative
    * explode→md5→groupBy-min plan (the oracle SQL keeps that
    * formulation) with no exploded rows and no shuffle: the dedup
    * family's dominant cost becomes pure digest arithmetic. Cached:
    * computed once per (dir) and shared by every query and join side
    * (at warehouse scale, a write-once table).
    */
  private def minhashSig(s: SparkSession, dir: String): DataFrame = {
    val sig = graft.functions.MinHashSig.minhash_sig(col("text"), NumHashes)
    val mSel = (0 until NumHashes).map(i => col("sig").getItem(i).as(s"m$i"))
    docs(s, dir)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id") +: sig.as("sig") +: Nil: _*)
      .select(col("doc_id") +: mSel: _*)
      // Explicit MEMORY_AND_DISK (the Dataset default, spelled out):
      // these shared memos are multi-stage builds, and an evicted
      // block under memory pressure must re-read from local disk, not
      // recompute the whole build — the 20x rep blowups the r10
      // driver capture showed under an external memory squeeze.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private def minhashSigSql: String = {
    val mins = (0 until NumHashes).map { i =>
      s"min(substr(md5('${i / 4}' || s), ${(i % 4) * 8 + 1}, 8)) AS m$i"
    }.mkString(", ")
    s"""SELECT doc_id, $mins
       |FROM (
       |  SELECT doc_id, substr(text, i, 8) AS s
       |  FROM documents,
       |    LATERAL (SELECT unnest(generate_series(1, length(text)-7)) AS i) g
       |  WHERE length(text) >= 8)
       |GROUP BY doc_id""".stripMargin
  }

  /** Banded-LSH candidate pairs (a_id < b_id, distinct): docs sharing
    * ANY band signature. Shared by the banded-scoring gate and the
    * cluster-resolution (connected components) gate.
    */
  /** Per-doc band rows (doc_id, band, key) from the cached MinHash
    * signatures — the LSH bucketing relation both the full-corpus
    * candidate generation and the delta-vs-base incremental probe
    * read.
    */
  private def bandFrame(s: SparkSession, dir: String): DataFrame = {
    val r = NumHashes / NumBands
    val sig = minhashSig(s, dir)
    (0 until NumBands).map { bi =>
      val keyCols = (bi * r until (bi + 1) * r).map(i => col(s"m$i"))
      sig.select(col("doc_id"), lit(bi + 1).as("band"),
        concat_ws("|", keyCols: _*).as("key"))
    }.reduce(_ unionByName _)
  }

  private[graft] def bandedCandidates(s: SparkSession, dir: String): DataFrame = {
    val bands = bandFrame(s, dir)
    // triangle block decomposition of each band bucket: complete
    // candidate set, one hot bucket's pairs spread across block-pair
    // tasks (graft.functions.Pairs)
    graft.functions.Pairs.blockedSelfPairs(bands,
        keyCols = Seq("band", "key"), idCol = "doc_id",
        payload = Nil, blockSize = MaxBandBucket)
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id"))
      .dropDuplicates()
      // cached: the banded-scoring gate and the connected-components
      // gate both consume this pair set (Spark's cache manager dedupes
      // by logical plan, so the two invocations share one entry — the
      // same write-once-candidates shape a warehouse pipeline has)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The `sig`/`bands` CTE prefix mirroring [[bandFrame]] for the
    * DuckDB oracles (no leading WITH — callers splice it).
    */
  private[operators] def sigBandsCtes: String = {
    val r = NumHashes / NumBands
    val bandSelects = (0 until NumBands).map { bi =>
      val key = (bi * r until (bi + 1) * r).map(i => s"m$i")
        .mkString(" || '|' || ")
      s"SELECT doc_id, ${bi + 1} AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""sig AS ($minhashSigSql),
       |bands AS (
       |  $bandSelects)""".stripMargin
  }

  /** The `sig`/`bands`/`cand` CTE chain mirroring [[bandedCandidates]]
    * for the DuckDB oracles (no leading WITH — callers splice it).
    */
  private[operators] def bandedCandCtes: String =
    s"""$sigBandsCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin

  /** Per-doc DISTINCT word-3-gram arrays (doc_id, gs), cached: the
    * exact-verification truth that both the symmetric (Jaccard) and
    * the asymmetric (containment) LSH-verification gates read — at
    * warehouse scale the write-once `doc_ngrams` table beside the
    * candidate pair set. Docs under 3 tokens carry no row; callers
    * left-join and null-guard, matching the oracles' join semantics.
    */
  private def gramSets(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(1, size(ts)-2),
          |  i -> concat(element_at(ts, i), ' ', element_at(ts, i+1),
          |              ' ', element_at(ts, i+2))))""".stripMargin).as("gs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** df-bounded tf-idf posting table for [[dedup_tfidf_cosine]]: one
    * array of ≤ 16 weighted postings per surviving word-3-gram. The
    * df-filter runs BEFORE any posting list materializes (a stopword
    * shingle never collects its million-row list); weights are the
    * exact-integer tf · (1e6 div df). Plan-keyed cache (norm pass +
    * pair generation + bench reps share one build); released in
    * [[releaseCaches]].
    */
  private def tfidfPosts(s: SparkSession, dir: String): DataFrame = {
    val tf = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', slice(ws, i, 3)))"))
          .as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
      .filter(col("dfc").between(2, 16))
    tf.join(dfc, Seq("tok"))
      .groupBy(col("tok"))
      .agg(collect_list(struct(col("doc_id"),
        expr("tf * (1000000 div dfc)").as("w"))).as("ps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Full word-3-gram Jaccard oracle (pairs ≥ 0.02 within blocks,
    * df-ceiling-consistent) — shared by the jaccard gate and the
    * banded-recall gate, which embeds it as the truth set. The
    * stop-phrase ceiling is the ADAPTIVE per-block df-quantile rule
    * (see [[NgramDfQuantilePermyriad]]), mirrored exactly: integer
    * cumulative counts over the per-block df histogram, never an
    * engine quantile builtin (whose interpolation conventions
    * differ). */
  private[operators] val ngramJaccardSql: String =
    s"""WITH toks AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS ts
        |  FROM documents),
        |ngrams0 AS (
        |  SELECT DISTINCT doc_id, lang, source,
        |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS ng
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
        |  WHERE len(ts) >= 3),
        |dfs AS (
        |  SELECT lang, source, ng, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM ngrams0 GROUP BY 1, 2, 3),
        |hist AS (
        |  SELECT lang, source, df, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM dfs GROUP BY 1, 2, 3),
        |qd AS (
        |  SELECT lang, source, MIN(df) AS qd FROM (
        |    SELECT lang, source, df,
        |      SUM(k) OVER (PARTITION BY lang, source ORDER BY df)
        |        AS cum,
        |      SUM(k) OVER (PARTITION BY lang, source) AS tot
        |    FROM hist) h
        |  WHERE cum * 10000 >= tot * $NgramDfQuantilePermyriad
        |  GROUP BY 1, 2),
        |caps AS (
        |  SELECT lang, source,
        |    LEAST($MaxNgramDf, GREATEST(qd, $MinNgramDf)) AS dcap
        |  FROM qd),
        |ngrams AS (
        |  SELECT n.doc_id, n.lang, n.source, n.ng
        |  FROM ngrams0 n
        |  JOIN dfs USING (lang, source, ng)
        |  JOIN caps USING (lang, source)
        |  WHERE df <= dcap),
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
        |ORDER BY a_id, b_id""".stripMargin

  /** (a_id, b_id, n_inter, jaccard) pairs — the Spark mirror of
    * [[ngramJaccardSql]], unordered. Memoized per (session, dir), NOT
    * just `.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)`d: the posting-list stage checkpoints through
    * `Materialize.stable`, so each invocation would build a fresh
    * lineage the plan-equality cache cannot dedupe (the same reason
    * the connected-components labels are memoized). Consumed by the
    * jaccard gate and the banded-recall gate.
    */
  private val njMemo = new graft.functions.DataFrameMemo
  private def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame =
    njMemo.getOrBuild(s, dir)(buildNgramJaccardPairs(s, dir))

  /** Release memoized pairs — all entries of `session`, or every entry
    * when called with None (same lifecycle hook as
    * [[clearClusterLabels]]); cached blocks are unpersisted, checkpoint
    * files follow the [[graft.functions.Materialize]] retention
    * contract.
    */
  def clearNgramJaccardPairs(session: Option[SparkSession] = None): Unit =
    njMemo.clear(session)

  /** The bounded (lang, source, ng) → sorted-doc-list posting table
    * both jaccard consumers read — every list ≤ MaxNgramDf by
    * construction (see the two-pass note inside). Materialize.stable'd
    * so sizes and intersections share one build; NOT memoized across
    * calls (callers that need reuse go through [[ngramJaccardPairs]]'
    * memo).
    */
  private def buildNgramPosting(s: SparkSession, dir: String)
      : DataFrame = {

      // distinct n-grams per doc via array_distinct BEFORE the explode:
      // map-side, no dropDuplicates shuffle of the exploded table
      val exploded = docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(expr(
            """array_distinct(transform(sequence(1, size(ts)-2),
              |  i -> concat(element_at(ts, i), ' ', element_at(ts, i+1),
              |              ' ', element_at(ts, i+2))))""".stripMargin)).as("ng"))
      // Two-pass posting-list construction so the stop-phrase ceiling
      // bounds every list BY CONSTRUCTION, not after the fact: pass 1
      // is a pure hash-agg count per (block, n-gram) — constant-size
      // aggregation buffers however hot the n-gram — whose
      // over-ceiling survivors (the stop phrases, the top-0.1%
      // hottest grams per block under the adaptive quantile rule)
      // anti-join the exploded table; only then does pass 2
      // collect_list, every buffer now ≤ the block's ceiling. A
      // single-pass collect-then-filter would materialize a hot
      // stop-phrase's ENTIRE doc list in one aggregation buffer first
      // — the exact unbounded state this ceiling exists to prevent.
      // The df table is Materialize.stable'd because TWO consumers
      // read it (the per-block ceiling fold and the stop-phrase
      // filter) — one count pass over the exploded corpus, not two.
      // The ceiling table is one row per block — broadcast. The
      // anti-join is left un-hinted so AQE broadcasts the stop-phrase
      // set when it is small (the common case) without betting
      // correctness on it.
      val dfc = graft.functions.Materialize.stable(exploded
        .groupBy(col("lang"), col("source"), col("ng"))
        .agg(count(lit(1)).as("__df")))
      val hot = dfc
        .join(broadcast(ngramCeilings(dfc)), Seq("lang", "source"))
        .filter(col("__df") > col("__dcap"))
        .select(col("lang"), col("source"), col("ng"))
      // posting lists are the bounded intermediate both downstream
      // consumers (sizes, intersections) read — materialize them once
      // (Materialize.stable) instead of re-exploding the corpus per
      // consumer; at warehouse scale this is the transient posting
      // table a dedup job writes between its two phases
      graft.functions.Materialize.stable(exploded
        .join(hot, Seq("lang", "source", "ng"), "left_anti")
        .groupBy(col("lang"), col("source"), col("ng"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds")))
  }

  /** The adaptive per-block df ceiling (r15, VERDICT r14 #2): for
    * each (lang, source) block, the smallest df `d` such that grams
    * with df ≤ d are ≥ [[NgramDfQuantilePermyriad]]/10000 of the
    * block's distinct grams, clamped to [MinNgramDf, MaxNgramDf] —
    * exact integer cumulative counts over the df histogram, the same
    * arithmetic the oracle SQL spells. Input: the (lang, source, ng,
    * __df) count table; output: one (lang, source, __dcap) row per
    * block. The windows run over the per-block df HISTOGRAM (distinct
    * df values — dozens of rows per block), never the gram table.
    */
  private[graft] def ngramCeilings(dfc: DataFrame): DataFrame = {
    val byBlock = Window.partitionBy(col("lang"), col("source"))
    dfc.groupBy(col("lang"), col("source"), col("__df"))
      .agg(count(lit(1)).as("__k"))
      .withColumn("__cum",
        sum(col("__k")).over(byBlock.orderBy(col("__df"))))
      .withColumn("__tot", sum(col("__k")).over(byBlock))
      .filter(col("__cum") * 10000 >=
        col("__tot") * NgramDfQuantilePermyriad)
      .groupBy(col("lang"), col("source"))
      .agg(min(col("__df")).as("__qd"))
      .select(col("lang"), col("source"),
        least(lit(MaxNgramDf.toLong),
          greatest(col("__qd"), lit(MinNgramDf.toLong))).as("__dcap"))
  }

  /** Per-block adaptive ceilings for a corpus dir — the measurement
    * surface [[graft.Scaling]] reads (one row per (lang, source):
    * __dcap). */
  private[graft] def ngramBlockCeilings(s: SparkSession, dir: String)
      : DataFrame = {
    val dfc = docs(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("lang"), col("source"),
        explode(expr(
          """array_distinct(transform(sequence(1, size(ts)-2),
            |  i -> concat(element_at(ts, i), ' ', element_at(ts, i+1),
            |              ' ', element_at(ts, i+2))))""".stripMargin))
          .as("ng"))
      .groupBy(col("lang"), col("source"), col("ng"))
      .agg(count(lit(1)).as("__df"))
    ngramCeilings(dfc)
  }

  private def buildNgramJaccardPairs(s: SparkSession, dir: String)
      : DataFrame = {
      val posting = buildNgramPosting(s, dir)
      val sizes = posting
        .select(explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      // every same-list pair, ids ascending: ≤ C(MaxNgramDf, 2) per
      // n-gram by construction
      val inter = posting
        .filter(size(col("ds")) >= 2)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |    y -> named_struct('a', x, 'b', y))))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a_id"), col("p.b").as("b_id"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
        .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")))
        .filter(col("jaccard") >= 0.02)
        .select(col("a_id"), col("b_id"), col("n_inter"), col("jaccard"))
        
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

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
    // n-hash signature land in one LSH bucket; canonical id per bucket.
    QuerySpec.sql(
      "dedup_minhash_lsh",
      s"""SELECT doc_id, ${mcols.mkString(", ")},
         |  MIN(doc_id) OVER (PARTITION BY ${mcols.mkString(", ")}) AS keep_id
         |FROM ($minhashSigSql)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      minhashSig(s, dir)
        .withColumn("keep_id",
          min(col("doc_id")).over(
            Window.partitionBy(mcols.map(col): _*)))
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
      // codegen'd per-document expression (graft.functions.SimHash):
      // the declarative token×16-bit-row explode with two groupBys
      // became one generated loop — identical values, no shuffle (the
      // oracle keeps the unnest formulation; SimHashSpec proves the
      // equivalence against it)
      docs(s, dir)
        .select(col("doc_id"),
          graft.functions.SimHash.simhash(col("text")).as("simhash"))
        .orderBy(col("doc_id"))
    },

    // Banded MinHash-LSH: n hashes → b bands of n/b rows; docs sharing
    // ANY band signature become candidate pairs (the classic b×r
    // banding that catches near-dups a full-signature match misses),
    // scored by the fraction of matching minhashes (Jaccard estimator).
    // Band-bucket pair generation is triangle-block-decomposed so one
    // hot band value can't serialize onto a single task.
    QuerySpec.sql(
      "dedup_minhash_banded", {
        val estimator = (0 until NumHashes)
          .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
          .mkString("\n         |      + ")
        s"""WITH $bandedCandCtes
           |SELECT c.a_id, c.b_id,
           |  CAST(($estimator) AS DOUBLE) / $NumHashes
           |    AS est_jaccard
           |FROM cand c
           |JOIN sig sa ON sa.doc_id = c.a_id
           |JOIN sig sb ON sb.doc_id = c.b_id
           |ORDER BY a_id, b_id""".stripMargin
      }) { (s, dir) =>
      val sig = minhashSig(s, dir)
      val cand = bandedCandidates(s, dir)
      val sa = sig.select(col("doc_id").as("a_id") +:
        (0 until NumHashes).map(i => col(s"m$i").as(s"a$i")): _*)
      val sb = sig.select(col("doc_id").as("b_id") +:
        (0 until NumHashes).map(i => col(s"m$i").as(s"b$i")): _*)
      val matches = (0 until NumHashes)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      cand.join(sa, Seq("a_id")).join(sb, Seq("b_id"))
        .withColumn("est_jaccard", matches.cast("double") / NumHashes)
        .select(col("a_id"), col("b_id"), col("est_jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // N-gram Jaccard near-dup: distinct word-3-gram sets, candidate
    // pairs within (lang, source) blocks, |A∩B| / |A∪B| ≥ 0.02.
    // Stop-phrase guard (ADAPTIVE since r15): each block's df ceiling
    // is the top-0.1%-of-distinct-grams quantile clamped to
    // [MinNgramDf, MaxNgramDf]; over-ceiling grams are removed from
    // the sets ENTIRELY (sizes and intersections — consistent Jaccard
    // over non-stop n-grams), so no posting list can explode the pair
    // join AND the measured candidate growth bends to ×7.4 per ×4
    // corpus on a natural vocabulary (SCALING.md) where the old
    // fixed-1000 ceiling was ×15.7, at 97–99.6% true-pair retention.
    // The MinNgramDf floor means the guard never triggers at test
    // scale (max df there is 4) — low-skew corpora are never pruned.
    QuerySpec.sql("dedup_ngram_jaccard", ngramJaccardSql) { (s, dir) =>
      ngramJaccardPairs(s, dir).orderBy(col("a_id"), col("b_id"))
    },

    // Duplication hotspot report by SOURCE — where the near-dup mass
    // actually lives (the number a curation run reads before deciding
    // which feed to renegotiate). Rides the memoized jaccard pair
    // table (pairs are same-source by blocking construction): per
    // source, pair count, distinct docs involved, and the mean
    // similarity as exact micro units — each pair's float jaccard is
    // floor-quantized to an integer FIRST (identical per row in both
    // engines), so the mean is an order-independent integer ratio,
    // never a float accumulation. Aggregate-grain only; the corpus is
    // not rescanned.
    QuerySpec.sql(
      "dedup_source_profile",
      s"""WITH pj AS (SELECT * FROM ($ngramJaccardSql)),
         |src AS (SELECT doc_id, source FROM documents),
         |m AS (
         |  SELECT s.source, p.a_id, p.b_id, p.jaccard
         |  FROM pj p JOIN src s ON s.doc_id = p.a_id),
         |dd AS (
         |  SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
         |    AS docs_involved
         |  FROM (SELECT source, a_id AS doc_id FROM m
         |    UNION ALL SELECT source, b_id FROM m) u
         |  GROUP BY 1),
         |pp AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(CAST(FLOOR(jaccard * 1000000) AS BIGINT))
         |      // COUNT(*) AS BIGINT) AS mean_jaccard_micro,
         |    MAX(jaccard) AS max_jaccard
         |  FROM m GROUP BY 1)
         |SELECT pp.source, n_pairs, docs_involved, mean_jaccard_micro,
         |  max_jaccard
         |FROM pp JOIN dd USING (source)
         |ORDER BY pp.source""".stripMargin) { (s, dir) =>
      val m = ngramJaccardPairs(s, dir)
        .join(docs(s, dir).select(col("doc_id").as("a_id"),
          col("source")), Seq("a_id"))
        .select(col("source"), col("a_id"), col("b_id"), col("jaccard"))
      val dd = m.select(col("source"), col("a_id").as("doc_id"))
        .union(m.select(col("source"), col("b_id").as("doc_id")))
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("docs_involved"))
      val pp = m.groupBy(col("source"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CAST(FLOOR(jaccard * 1000000) AS BIGINT)"))
            .as("sj"),
          max(col("jaccard")).as("max_jaccard"))
        .select(col("source"), col("n_pairs"),
          expr("CAST(sj div n_pairs AS BIGINT)")
            .as("mean_jaccard_micro"),
          col("max_jaccard"))
      pp.join(dd, Seq("source"))
        .select(col("source"), col("n_pairs"), col("docs_involved"),
          col("mean_jaccard_micro"), col("max_jaccard"))
        .orderBy(col("source"))
    },

    // EXACT set-similarity self-join via prefix filtering (the
    // PPJoin-family candidate rule): unlike the LSH/banded gates
    // (probabilistic recall) and dedup_ngram_jaccard (df-ceiling +
    // language blocking), this finds EVERY word-3-gram-Jaccard ≥ 0.6
    // pair with no blocking assumptions. Grams sort globally
    // rarest-first (df, gram); two docs can reach τ only if their
    // first n − ⌈τn⌉ + 1 grams share one, so candidates come from an
    // equi-join of those prefixes — df-biased toward df-1 grams, so
    // the candidate surface tracks true-pair density, not corpus².
    // ⌈0.6n⌉ evaluates as the exact integer (3n+4) div 5 — the prefix
    // bound never rides a float. The oracle joins on ALL shared grams
    // (its completeness is definitional), so the hash compare proves
    // the prefix filter lost nothing.
    QuerySpec.sql(
      "dedup_prefix_filter",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |      AS ng
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
        |  WHERE len(ts) >= 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        |  FROM grams a JOIN grams b ON b.ng = a.ng AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(c AS BIGINT) AS n_inter,
        |  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val ordered = orderedGrams(s, dir)
      prefixCandidates(s, dir)
        .join(ordered.select(col("doc_id").as("doc_a"),
          col("toks").as("ta"), col("n").as("na")), Seq("doc_a"))
        .join(ordered.select(col("doc_id").as("doc_b"),
          col("toks").as("tb"), col("n").as("nb")), Seq("doc_b"))
        .withColumn("n_inter",
          size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .withColumn("jaccard", col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc_a"), col("doc_b"), col("n_inter"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Self-measuring candidate-generation quality for the DEDUP
    // pipeline — the ANN-recall-gate discipline applied to banded
    // MinHash: of the true lexical near-dup pairs (word-3-gram Jaccard,
    // df-ceiling-consistent — the same truth dedup_lsh_verified
    // verifies against), what fraction did the banded candidate set
    // catch, per similarity band? The knobs this oracle-checks are
    // NumHashes/NumBands (the S-curve); a mis-banding that silently
    // dropped high-similarity pairs would flip `recall` here, not just
    // degrade a downstream eyeball metric. Counts are exact longs and
    // the recall is one division of exact operands, so both engines
    // agree bit-for-bit. Cost: the truth set is already df-bounded, the
    // candidate set LSH-bounded; the probe is a left join of two small
    // pair tables (both cached, shared with their own gates).
    QuerySpec.sql(
      "dedup_band_recall",
      s"""WITH ${bandedCandCtes},
         |truth AS (SELECT * FROM ($ngramJaccardSql) tt)
         |SELECT
         |  CASE WHEN t.jaccard >= 0.5 THEN 'high'
         |       WHEN t.jaccard >= 0.2 THEN 'mid'
         |       ELSE 'low' END AS bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_true,
         |  CAST(SUM(CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_caught,
         |  CAST(SUM(CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / COUNT(*) AS recall
         |FROM truth t
         |LEFT JOIN cand c ON c.a_id = t.a_id AND c.b_id = t.b_id
         |GROUP BY 1
         |ORDER BY bin""".stripMargin) { (s, dir) =>
      val truth = ngramJaccardPairs(s, dir)
        .withColumn("bin",
          when(col("jaccard") >= 0.5, "high")
            .when(col("jaccard") >= 0.2, "mid")
            .otherwise("low"))
      val cand = bandedCandidates(s, dir).withColumn("hit", lit(1))
      truth.join(cand, Seq("a_id", "b_id"), "left")
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_caught"))
        .withColumn("recall",
          col("n_caught").cast("double") / col("n_true"))
        .select(col("bin"), col("n_true"), col("n_caught"), col("recall"))
        .orderBy(col("bin"))
    },


    // Cluster resolution: near-dup PAIRS (the banded-LSH candidates)
    // → connected components → one canonical keeper (minimum doc_id)
    // per component. The missing last stage of a dedup pipeline: pair
    // gates prove candidate generation, this proves the doc_id →
    // cluster_id assignment a 100 TB dedup job actually ships. Spark
    // side: O(diameter) rounds of min-label propagation
    // (graft.functions.ConnectedComponents); oracle: DuckDB recursive
    // CTE computing min reachable id — different algorithms, identical
    // fixpoint.
    QuerySpec.sql(
      "dedup_connected_components",
      s"""WITH RECURSIVE $bandedCandCtes,
         |edges AS (
         |  SELECT a_id AS u, b_id AS v FROM cand
         |  UNION ALL SELECT b_id, a_id FROM cand),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT re.id, e.v FROM reach re JOIN edges e ON e.u = re.r)
         |SELECT id AS doc_id, MIN(r) AS cluster_id
         |FROM reach GROUP BY id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      clusterLabels(s, dir)
        .select(col("doc_id"), col("label").as("cluster_id"))
        .orderBy(col("doc_id"))
    },

    // Cluster-representative selection — the decision step AFTER
    // clustering: keep the best document of every near-dup cluster
    // (longest text, doc_id as the deterministic tie-break) and record
    // the cluster size. One join of the cluster labels against the
    // docs dimension, then a per-cluster window (keys uniform — a
    // cluster is as big as its near-dup set, which LSH banding keeps
    // bounded). Shares the memoized component labels with the
    // dedup_connected_components gate, so the fixpoint iteration runs
    // ONCE per session/dir — exactly how a pipeline would stage it
    // (labels as a write-once table consumed by both reports).
    QuerySpec.sql(
      "dedup_cluster_rep",
      s"""WITH RECURSIVE $bandedCandCtes,
         |edges AS (
         |  SELECT a_id AS u, b_id AS v FROM cand
         |  UNION ALL SELECT b_id, a_id FROM cand),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT re.id, e.v FROM reach re JOIN edges e ON e.u = re.r),
         |cc AS (
         |  SELECT id AS doc_id, MIN(r) AS cluster_id
         |  FROM reach GROUP BY id)
         |SELECT cluster_id, rep_id, sz FROM (
         |  SELECT cc.cluster_id, d.doc_id AS rep_id,
         |    count(*) OVER (PARTITION BY cc.cluster_id) AS sz,
         |    row_number() OVER (PARTITION BY cc.cluster_id
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
         |  FROM cc JOIN documents d ON d.doc_id = cc.doc_id)
         |WHERE rn = 1
         |ORDER BY cluster_id""".stripMargin) { (s, dir) =>
      clusterReps(s, dir).orderBy(col("cluster_id"))
    },

    // Cluster-size histogram: how big are the near-dup clusters —
    // the dedup-health report (a corpus dominated by large clusters
    // has a template/boilerplate problem; all-singletons means the
    // LSH recall knob is too tight). Two hash aggregates over the
    // memoized labels.
    QuerySpec.sql(
      "dedup_cluster_sizes",
      s"""WITH RECURSIVE $bandedCandCtes,
         |edges AS (
         |  SELECT a_id AS u, b_id AS v FROM cand
         |  UNION ALL SELECT b_id, a_id FROM cand),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT re.id, e.v FROM reach re JOIN edges e ON e.u = re.r),
         |cc AS (
         |  SELECT id AS doc_id, MIN(r) AS cluster_id
         |  FROM reach GROUP BY id),
         |sizes AS (
         |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM cc GROUP BY 1)
         |SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_clusters
         |FROM sizes GROUP BY sz
         |ORDER BY sz""".stripMargin) { (s, dir) =>
      clusterLabels(s, dir)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("sz"))
    },

    // LSH → verify: the production near-dup pipeline's second stage.
    // Banded-MinHash candidates are a superset with false positives;
    // each candidate pair is VERIFIED against the true word-3-gram
    // Jaccard before any document is dropped. The exact set
    // intersection runs only on the candidate pairs (LSH already cut
    // the quadratic space), as one per-pair array_intersect over the
    // per-doc distinct-3-gram arrays — no posting-list re-join, no
    // df-ceiling needed because the pair set is already bounded.
    // INCREMENTAL near-dup — the pattern production corpora actually
    // run: yesterday's corpus is already deduped; today's delta batch
    // (doc_id % 5 = 0, ~20%) probes the base (the other 80%) through
    // the SAME banded-LSH index, and only delta×base candidates get
    // exact verification — never base×base again. Per delta doc:
    // candidate count, verified-dup count, and the min-id base keeper
    // it collapses into. At 100 TB the band index is the persisted
    // byproduct of the original dedup; each nightly batch costs
    // |delta| signature builds + one bucket join against it.
    QuerySpec.sql(
      "dedup_incremental",
      s"""WITH $sigBandsCtes,
         |cand AS (
         |  SELECT DISTINCT d.doc_id AS delta_id, b.doc_id AS base_id
         |  FROM bands d JOIN bands b
         |    ON d.band = b.band AND d.key = b.key
         |  WHERE d.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |ngrams AS (
         |  SELECT DISTINCT doc_id,
         |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS ng
         |  FROM toks,
         |    LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
         |  WHERE len(ts) >= 3),
         |sizes AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM ngrams GROUP BY 1),
         |inter AS (
         |  SELECT c.delta_id, c.base_id, CAST(COUNT(*) AS BIGINT)
         |      AS n_inter
         |  FROM cand c
         |  JOIN ngrams a ON a.doc_id = c.delta_id
         |  JOIN ngrams b ON b.doc_id = c.base_id AND b.ng = a.ng
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT c.delta_id, c.base_id,
         |    CASE WHEN COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
         |        - COALESCE(i.n_inter, 0) = 0 THEN CAST(0 AS DOUBLE)
         |      ELSE CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         |        / (COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
         |          - COALESCE(i.n_inter, 0)) END AS jaccard
         |  FROM cand c
         |  LEFT JOIN inter i
         |    ON i.delta_id = c.delta_id AND i.base_id = c.base_id
         |  LEFT JOIN sizes sa ON sa.doc_id = c.delta_id
         |  LEFT JOIN sizes sb ON sb.doc_id = c.base_id)
         |SELECT delta_id, CAST(COUNT(*) AS BIGINT) AS n_cands,
         |  CAST(COALESCE(SUM(CASE WHEN jaccard >= 0.05 THEN 1 END), 0)
         |    AS BIGINT) AS n_dups,
         |  MIN(CASE WHEN jaccard >= 0.05 THEN base_id END)
         |    AS base_keeper
         |FROM scored GROUP BY 1
         |ORDER BY delta_id""".stripMargin) { (s, dir) =>
      val bands = bandFrame(s, dir)
      val cand = bands.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(col("doc_id").as("delta_id"), col("band"), col("key"))
        .join(bands.filter(pmod(col("doc_id"), lit(5)) =!= 0)
          .select(col("doc_id").as("base_id"), col("band"), col("key")),
          Seq("band", "key"))
        .select(col("delta_id"), col("base_id"))
        .dropDuplicates()
      val g = gramSets(s, dir)
      val na = when(col("ga").isNull, 0L)
        .otherwise(size(col("ga")).cast("long"))
      val nb = when(col("gb").isNull, 0L)
        .otherwise(size(col("gb")).cast("long"))
      val ni = when(col("ga").isNull || col("gb").isNull, 0L)
        .otherwise(size(array_intersect(col("ga"), col("gb"))).cast("long"))
      cand
        .join(g.select(col("doc_id").as("delta_id"), col("gs").as("ga")),
          Seq("delta_id"), "left")
        .join(g.select(col("doc_id").as("base_id"), col("gs").as("gb")),
          Seq("base_id"), "left")
        .withColumn("n_inter", ni)
        .withColumn("jaccard",
          when(na + nb - col("n_inter") === 0, lit(0.0))
            .otherwise(col("n_inter").cast("double") /
              (na + nb - col("n_inter"))))
        .groupBy(col("delta_id"))
        .agg(count(lit(1)).as("n_cands"),
          coalesce(sum(when(col("jaccard") >= 0.05, 1L)), lit(0L))
            .as("n_dups"),
          min(when(col("jaccard") >= 0.05, col("base_id")))
            .as("base_keeper"))
        .orderBy(col("delta_id"))
    },

    QuerySpec.sql(
      "dedup_lsh_verified",
      s"""WITH $bandedCandCtes,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |ngrams AS (
         |  SELECT DISTINCT doc_id,
         |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS ng
         |  FROM toks,
         |    LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
         |  WHERE len(ts) >= 3),
         |sizes AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM ngrams GROUP BY 1),
         |inter AS (
         |  SELECT c.a_id, c.b_id, CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM cand c
         |  JOIN ngrams a ON a.doc_id = c.a_id
         |  JOIN ngrams b ON b.doc_id = c.b_id AND b.ng = a.ng
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, n_inter, jaccard,
         |  jaccard >= 0.05 AS is_dup
         |FROM (
         |  SELECT c.a_id, c.b_id,
         |    CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
         |    CASE WHEN COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
         |        - COALESCE(i.n_inter, 0) = 0 THEN CAST(0 AS DOUBLE)
         |      ELSE CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         |        / (COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
         |          - COALESCE(i.n_inter, 0)) END AS jaccard
         |  FROM cand c
         |  LEFT JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id
         |  LEFT JOIN sizes sa ON sa.doc_id = c.a_id
         |  LEFT JOIN sizes sb ON sb.doc_id = c.b_id) v
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val g = gramSets(s, dir)
      val na = when(col("ga").isNull, 0L)
        .otherwise(size(col("ga")).cast("long"))
      val nb = when(col("gb").isNull, 0L)
        .otherwise(size(col("gb")).cast("long"))
      val ni = when(col("ga").isNull || col("gb").isNull, 0L)
        .otherwise(size(array_intersect(col("ga"), col("gb"))).cast("long"))
      bandedCandidates(s, dir)
        .join(g.select(col("doc_id").as("a_id"), col("gs").as("ga")),
          Seq("a_id"), "left")
        .join(g.select(col("doc_id").as("b_id"), col("gs").as("gb")),
          Seq("b_id"), "left")
        .withColumn("n_inter", ni)
        .withColumn("jaccard",
          when(na + nb - col("n_inter") === 0, lit(0.0))
            .otherwise(col("n_inter").cast("double") /
              (na + nb - col("n_inter"))))
        .select(col("a_id"), col("b_id"), col("n_inter"), col("jaccard"),
          (col("jaccard") >= 0.05).as("is_dup"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Asymmetric CONTAINMENT verification over the same banded-LSH
    // candidates: C(A→B) = |g(A) ∩ g(B)| / |g(A)| is near 1 when A is
    // a quote/boilerplate/partial-crawl SUBSET of a larger B even
    // though the symmetric Jaccard is small — the pair class a
    // Jaccard-threshold verifier clears. The standard second verifier
    // of a production near-dup stack. Same scale shape as
    // dedup_lsh_verified: exact set work only on LSH-bounded pairs;
    // the cached per-doc gram sets are shared with that gate (one
    // build per corpus).
    QuerySpec.sql(
      "dedup_containment",
      s"""WITH $bandedCandCtes,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |ngrams AS (
         |  SELECT DISTINCT doc_id,
         |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS ng
         |  FROM toks,
         |    LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
         |  WHERE len(ts) >= 3),
         |sizes AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM ngrams GROUP BY 1),
         |inter AS (
         |  SELECT c.a_id, c.b_id, CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM cand c
         |  JOIN ngrams a ON a.doc_id = c.a_id
         |  JOIN ngrams b ON b.doc_id = c.b_id AND b.ng = a.ng
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, n_inter, cont_ab, cont_ba,
         |  GREATEST(cont_ab, cont_ba) >= 0.5 AS is_subdup
         |FROM (
         |  SELECT c.a_id, c.b_id,
         |    CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
         |    CASE WHEN COALESCE(sa.n, 0) = 0 THEN CAST(0 AS DOUBLE)
         |      ELSE CAST(COALESCE(i.n_inter, 0) AS DOUBLE) / sa.n END
         |      AS cont_ab,
         |    CASE WHEN COALESCE(sb.n, 0) = 0 THEN CAST(0 AS DOUBLE)
         |      ELSE CAST(COALESCE(i.n_inter, 0) AS DOUBLE) / sb.n END
         |      AS cont_ba
         |  FROM cand c
         |  LEFT JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id
         |  LEFT JOIN sizes sa ON sa.doc_id = c.a_id
         |  LEFT JOIN sizes sb ON sb.doc_id = c.b_id) v
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val g = gramSets(s, dir)
      val na = when(col("ga").isNull, 0L)
        .otherwise(size(col("ga")).cast("long"))
      val nb = when(col("gb").isNull, 0L)
        .otherwise(size(col("gb")).cast("long"))
      val ni = when(col("ga").isNull || col("gb").isNull, 0L)
        .otherwise(size(array_intersect(col("ga"), col("gb"))).cast("long"))
      bandedCandidates(s, dir)
        .join(g.select(col("doc_id").as("a_id"), col("gs").as("ga")),
          Seq("a_id"), "left")
        .join(g.select(col("doc_id").as("b_id"), col("gs").as("gb")),
          Seq("b_id"), "left")
        .withColumn("n_inter", ni)
        .withColumn("cont_ab",
          when(na === 0, lit(0.0))
            .otherwise(col("n_inter").cast("double") / na))
        .withColumn("cont_ba",
          when(nb === 0, lit(0.0))
            .otherwise(col("n_inter").cast("double") / nb))
        .select(col("a_id"), col("b_id"), col("n_inter"),
          col("cont_ab"), col("cont_ba"),
          (greatest(col("cont_ab"), col("cont_ba")) >= 0.5).as("is_subdup"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Edit-distance verification over the LSH candidates: the
    // character-level near-dup test (templated rewrites with small
    // literal patches that keep token Jaccard high AND land within a
    // few dozen edits). Distance runs on the lowercase-ASCII skeleton
    // (case-fold, strip everything but [a-z ]) — normalization before
    // edit distance is standard, and on ASCII DuckDB's byte-level
    // levenshtein equals Spark's char-level one, so the distance
    // itself hash-compares. Two bounds keep the O(len²) DP off the
    // hot path: a length-gap prefilter (|la−lb| > EditMax proves
    // dist > EditMax with NO DP — the sentinel −1), and Spark's
    // bounded levenshtein(l, r, threshold) overload, which runs the
    // banded O(EditMax·len) DP and bails to −1 early. Cost stays
    // linear in the LSH candidate count — never corpus².
    QuerySpec.sql(
      "dedup_edit_verified",
      s"""WITH $bandedCandCtes,
         |dnorm AS (
         |  SELECT doc_id,
         |    regexp_replace(lower(text), '[^a-z ]', '', 'g') AS nt
         |  FROM documents)
         |SELECT a_id, b_id, len_gap, edit_dist,
         |  edit_dist >= 0 AND edit_dist <= $EditMax AS is_dup
         |FROM (
         |  SELECT c.a_id, c.b_id,
         |    CAST(abs(length(da.nt) - length(db.nt)) AS BIGINT) AS len_gap,
         |    CAST(CASE
         |      WHEN abs(length(da.nt) - length(db.nt)) > $EditMax THEN -1
         |      WHEN levenshtein(da.nt, db.nt) <= $EditMax
         |        THEN levenshtein(da.nt, db.nt)
         |      ELSE -1 END AS BIGINT) AS edit_dist
         |  FROM cand c
         |  JOIN dnorm da ON da.doc_id = c.a_id
         |  JOIN dnorm db ON db.doc_id = c.b_id) v
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z ]", "").as("nt"))
      bandedCandidates(s, dir)
        .join(d.select(col("doc_id").as("a_id"), col("nt").as("na")),
          Seq("a_id"))
        .join(d.select(col("doc_id").as("b_id"), col("nt").as("nb")),
          Seq("b_id"))
        .withColumn("len_gap",
          abs(length(col("na")) - length(col("nb"))).cast("long"))
        .withColumn("edit_dist",
          when(col("len_gap") > EditMax, lit(-1L))
            .otherwise(levenshtein(col("na"), col("nb"), EditMax)
              .cast("long")))
        .select(col("a_id"), col("b_id"), col("len_gap"), col("edit_dist"),
          (col("edit_dist") >= 0 && col("edit_dist") <= EditMax)
            .as("is_dup"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // C4-style GLOBAL line-level dedup (Raffel et al. 2020: discard
    // repeated spans corpus-wide, first occurrence wins), on
    // boundary-free text: documents are cut into consecutive
    // [[LineWords]]-word grid lines, keyed by their lowercase-trimmed
    // form, and every occurrence except the (smallest doc_id,
    // smallest position) keeper is dropped — lines shorter than
    // [[MinLineLen]] chars are exempt (always kept). The sub-document
    // dedup level the doc-level families can't express: boilerplate
    // repeated INSIDE otherwise-unique documents (136 grid lines
    // repeat across the sf0.01 fixture's near-dup docs).
    //
    // Scale shape: the shuffle key is the normalized line (uniform —
    // no hot key beyond true boilerplate, and the keeper aggregate is
    // map-side combinable even for those); one hash aggregate for the
    // keeper table, one equi-join back, one per-doc aggregate to
    // re-assemble. The keeper identity is the composite
    // doc_id·2^20 + pos (positions are bounded by document length;
    // at larger id domains widen the composite or use a struct min).
    QuerySpec.sql(
      "dedup_lines",
      s"""WITH segs AS (
         |  SELECT doc_id, u.g + 1 AS pos,
         |    array_to_string(
         |      ws[u.g * $LineWords + 1 : u.g * $LineWords + $LineWords],
         |      ' ') AS sent
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM documents) t,
         |    UNNEST(generate_series(0,
         |      CAST(FLOOR((len(ws) - 1) / $LineWords) AS BIGINT))) AS u(g)),
         |keyed AS (
         |  SELECT doc_id, pos, sent, lower(trim(sent)) AS k,
         |    length(lower(trim(sent))) >= $MinLineLen AS is_cand
         |  FROM segs),
         |keeper AS (
         |  SELECT k, MIN(doc_id * 1048576 + pos) AS kp
         |  FROM keyed WHERE is_cand GROUP BY k),
         |kept AS (
         |  SELECT s.doc_id, s.pos, s.sent,
         |    (NOT s.is_cand) OR s.doc_id * 1048576 + s.pos = kr.kp AS keep
         |  FROM keyed s LEFT JOIN keeper kr ON kr.k = s.k)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  md5(COALESCE(string_agg(CASE WHEN keep THEN sent END, '|'
         |    ORDER BY pos), '')) AS kept_digest
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
      val segs = docs(s, dir)
        .select(col("doc_id"), posexplode(expr(
          s"""transform(
             |  sequence(0, (size(split(text, ' ')) - 1) div $LineWords),
             |  g -> concat_ws(' ',
             |    slice(split(text, ' '), g * $LineWords + 1, $LineWords)))"""
            .stripMargin)).as(Seq("pos0", "sent")))
        .withColumn("pos", (col("pos0") + 1).cast("long"))
        .withColumn("k", lower(trim(col("sent"))))
        .withColumn("is_cand", length(col("k")) >= MinLineLen)
      val keeper = segs.filter(col("is_cand"))
        .groupBy(col("k"))
        .agg(min(col("doc_id") * lit(1048576L) + col("pos")).as("kp"))
      val kept = segs.join(keeper, Seq("k"), "left")
        .withColumn("keep",
          !col("is_cand") ||
            (col("doc_id") * lit(1048576L) + col("pos")) === col("kp"))
      kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          expr("""md5(concat_ws('|', transform(
            |  array_sort(collect_list(
            |    CASE WHEN keep THEN struct(pos, sent) END)),
            |  x -> x.sent)))""".stripMargin).as("kept_digest"))
        .orderBy(col("doc_id"))
    },

    // Shared-span near-dup pairs via winnowing: two documents that
    // share >= 3 winnow fingerprints (k=8-char shingles, window w=4 —
    // the text_winnow parameters) share long literal character spans,
    // the MOSS/substring-dedup signal that token-level Jaccard can
    // miss. Plan: per-doc fingerprints from the codegen'd WinnowFp
    // pass, explode to postings, document-frequency filter (df in
    // [2, 16]) bounds every posting list BEFORE pair generation —
    // boilerplate fingerprints shared by half the corpus never join —
    // then a fp-keyed equi-self-join and one pair-count aggregate.
    // Worst-case pairs per fingerprint = C(16, 2), linear overall.
    QuerySpec.sql(
      "dedup_winnow_pairs",
      """WITH fps AS (
        |  SELECT doc_id, unnest(fp) AS fp FROM (
        |    SELECT doc_id, list_sort(list_distinct(list_transform(
        |      generate_series(1, len(hashes) - 3),
        |      j -> list_aggregate(hashes[j:j+3], 'min')))) AS fp
        |    FROM (SELECT doc_id,
        |        list_transform(generate_series(1, length(text) - 7),
        |          i -> md5(substr(text, i, 8))) AS hashes
        |      FROM documents WHERE length(text) >= 11) h) x),
        |df AS (SELECT fp, COUNT(*) AS dfc FROM fps GROUP BY 1),
        |keep AS (SELECT f.doc_id, f.fp FROM fps f JOIN df d ON d.fp = f.fp
        |  AND d.dfc BETWEEN 2 AND 16)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
        |FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val fps = TextOps.winnowFps(s, dir)
        .select(col("doc_id"), explode(col("fp")).as("fp"))
      val df = fps.groupBy(col("fp")).agg(count(lit(1)).as("dfc"))
        .filter(col("dfc").between(2, 16))
      val keep = fps.join(df.select(col("fp")), Seq("fp"))
      keep.select(col("fp"), col("doc_id").as("a_id"))
        .join(keep.select(col("fp"), col("doc_id").as("b_id")), Seq("fp"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Lexical tf-idf cosine near-dup pairs — the sparse-vector
    // counterpart of dedup_embedding_cosine, vectorizing each doc
    // over the df-bounded word-3-gram space (df ∈ [2, 16]: singleton
    // shingles can't pair, boilerplate shingles shared by half the
    // corpus are excluded by design — and the posting-list ceiling
    // dedup_winnow_pairs uses means no shingle joins more than
    // C(16,2) pairs; unigrams won't do here — this corpus' word
    // vocabulary is ~31 terms, all stopword-frequency). Weights stay
    // EXACT integers — w = tf · (1e6 div df), the floor-division idf
    // surrogate graph_link_predict uses — so dot products and norms
    // are exact longs and the τ = 0.25 decision runs entirely in
    // integer arithmetic (16·dot² ≥ ‖a‖²·‖b‖² in DECIMAL(38,0) /
    // HUGEINT, the dedup_semantic discipline); the reported cos is
    // one shared-text division over exact operands.
    QuerySpec.sql(
      "dedup_tfidf_cosine",
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS tok
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents) t,
        |      UNNEST(range(1, len(ws) - 1)) AS r(i)) g
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT f.doc_id, f.tok, f.tf * (1000000 // d.dfc) AS w
        |  FROM tf f JOIN (SELECT tok, CAST(COUNT(*) AS BIGINT) AS dfc
        |    FROM tf GROUP BY 1) d
        |    ON d.tok = f.tok AND d.dfc BETWEEN 2 AND 16),
        |n2 AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
        |  FROM w GROUP BY 1),
        |dt AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(SUM(a.w * b.w) AS BIGINT) AS dot
        |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d.a_id, d.b_id, d.dot,
        |  CAST(d.dot AS DOUBLE) /
        |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |    AS cos
        |FROM dt d JOIN n2 na ON na.doc_id = d.a_id
        |  JOIN n2 nb ON nb.doc_id = d.b_id
        |WHERE d.dot > 0
        |  AND 16 * CAST(d.dot AS HUGEINT) * CAST(d.dot AS HUGEINT)
        |    >= CAST(na.n2 AS HUGEINT) * CAST(nb.n2 AS HUGEINT)
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val posts = tfidfPosts(s, dir)
      val n2 = posts.select(explode(col("ps")).as("e"))
        .groupBy(col("e.doc_id").as("doc_id"))
        .agg(sum(col("e.w") * col("e.w")).cast("long").as("n2"))
      val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
      posts.select(explode(col("ps")).as("a"), col("ps"))
        .select(col("a"), explode(col("ps")).as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(sum(col("a.w") * col("b.w")).cast("long").as("dot"))
        .join(n2.select(col("doc_id").as("a_id"), col("n2").as("na")),
          Seq("a_id"))
        .join(n2.select(col("doc_id").as("b_id"), col("n2").as("nb")),
          Seq("b_id"))
        .filter(col("dot") > 0 &&
          lit(16).cast(d19) * col("dot").cast(d19) * col("dot").cast(d19) >=
            col("na").cast(d19) * col("nb").cast(d19))
        .select(col("a_id"), col("b_id"), col("dot"),
          (col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
            .as("cos"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Exact duplicated-substring spans (Lee et al. 2022 "Deduplicating
    // Training Data Makes Language Models Better", the ExactSubstr
    // operator, word-granular): every maximal run of 8-word grams that
    // appears verbatim in ≥ 2 distinct documents, reported per document
    // as (span_start, span_end, span_words, n_grams) — the byte ranges
    // an ExactSubstr pass would cut before training. The suffix-array
    // formulation doesn't distribute; the equivalent gram-join does:
    // one flatMap emits (gram-hash, doc, pos), one hash aggregate finds
    // hashes spanning ≥ 2 docs, one shuffle join marks the hit
    // positions, and the maximal-run merge is the classic
    // pos − row_number() island trick inside each document (the window
    // partitions by doc_id — bounded per-doc state, uniform keys). At
    // 100 TB the gram emit is ~L× the corpus in shuffle volume, so the
    // gram is carried as a 16-byte md5 digest, never the text; the
    // duplicated-hash side of the join is corpus-dup-rate-sized
    // (typically ≪ 1% of grams), which AQE turns into a broadcast at
    // runtime when it fits.
    QuerySpec.sql(
      "dedup_substring",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |p AS (
        |  SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS pos FROM t),
        |g AS (
        |  SELECT doc_id, pos,
        |    md5(array_to_string(ws[pos:pos+7], ' ')) AS h
        |  FROM p),
        |d AS (
        |  SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        |hit AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (h)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS grp
        |  FROM hit)
        |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
        |  MAX(pos) + 7 - MIN(pos) + 1 AS span_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_grams
        |FROM isl GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
      val grams = substrGrams(s, dir)
      val dup = grams.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("h"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      grams.join(dup, Seq("h"))
        .select(col("doc_id"), col("pos"))
        .withColumn("grp", col("pos") - row_number().over(w))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("pos")).as("span_start"),
          (max(col("pos")) + (SubstrL - 1)).as("span_end"),
          (max(col("pos")) + (SubstrL - 1) - min(col("pos")) + 1)
            .as("span_words"),
          count(lit(1)).as("n_grams"))
        .drop("grp")
        .orderBy(col("doc_id"), col("span_start"))
    },

    // The CUT the span report prescribes: rewrite the corpus with
    // duplicated spans removed from every NON-OWNING document (the
    // owner of a duplicated gram is the smallest doc_id containing it,
    // so exactly one copy of every shared passage survives — Lee et
    // al.'s keep-one policy made deterministic). Output per document:
    // original word count, words cut, and the cleaned text. Scale
    // shape: the rewrite necessarily shuffles every word once to
    // reassemble documents — doc_id is the key (uniform); the
    // covered-position set is dup-rate-sized. The gram table is built
    // once and shared with dedup_substring via the cache.
    QuerySpec.sql(
      "dedup_substring_cut",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (
        |  SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS pos
        |  FROM t WHERE len(ws) >= 8),
        |g AS (
        |  SELECT doc_id, pos,
        |    md5(array_to_string(ws[pos:pos+7], ' ')) AS h
        |  FROM p),
        |kp AS (
        |  SELECT h, MIN(doc_id) AS keeper FROM g GROUP BY h
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |cut AS (
        |  SELECT DISTINCT doc_id, wpos FROM (
        |    SELECT g.doc_id, unnest(range(g.pos, g.pos + 8)) AS wpos
        |    FROM g JOIN kp ON kp.h = g.h AND g.doc_id <> kp.keeper) z),
        |wp AS (
        |  SELECT doc_id, ws[wpos] AS w, wpos FROM (
        |    SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS wpos
        |    FROM t) z),
        |kept AS (
        |  SELECT wp.doc_id, wp.wpos, wp.w FROM wp
        |  WHERE NOT EXISTS (SELECT 1 FROM cut c
        |    WHERE c.doc_id = wp.doc_id AND c.wpos = wp.wpos)),
        |clean AS (
        |  SELECT doc_id, array_to_string(list(w ORDER BY wpos), ' ')
        |    AS clean_text
        |  FROM kept GROUP BY doc_id),
        |nc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cut
        |  FROM cut GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.ws) AS BIGINT) AS n_words,
        |  COALESCE(nc.n_cut, 0) AS n_cut,
        |  COALESCE(clean.clean_text, '') AS clean_text
        |FROM t
        |LEFT JOIN nc ON nc.doc_id = t.doc_id
        |LEFT JOIN clean ON clean.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      val wsAll = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val grams = substrGrams(s, dir)
      val kp = grams.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"),
          min(col("doc_id")).as("keeper"))
        .filter(col("nd") >= 2)
        .select(col("h"), col("keeper"))
      val cut = grams.join(kp, Seq("h"))
        .filter(col("doc_id") =!= col("keeper"))
        .select(col("doc_id"),
          explode(expr(s"sequence(pos, pos + ${SubstrL - 1})")).as("wpos"))
        .distinct()
      val words = wsAll
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + 1).as("wpos"), col("w"))
      val clean = words.join(cut, Seq("doc_id", "wpos"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(expr("array_join(transform(array_sort(" +
          "collect_list(struct(wpos, w))), x -> x.w), ' ')").as("clean_text"))
      val nc = cut.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_cut"))
      wsAll.select(col("doc_id"), size(col("ws")).cast("long").as("n_words"))
        .join(nc, Seq("doc_id"), "left")
        .join(clean, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          coalesce(col("n_cut"), lit(0L)).as("n_cut"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy(col("doc_id"))
    })

  /** ExactSubstr gram width (words). */
  private[operators] val SubstrL = 8

  /** The (doc_id, pos, h) 8-word-gram digest table, cached so the span
    * report and the cut rewrite share one tokenize+hash pass per (dir)
    * — at warehouse scale this is the materialized gram index both
    * consumers scan.
    */
  private[operators] def substrGrams(s: SparkSession, dir: String)
      : DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= SubstrL)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(ws) - ${SubstrL - 1}),
           |  i -> struct(i AS pos,
           |    md5(array_join(slice(ws, i, $SubstrL), ' ')) AS h))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Component labels memoized per (session, dir): the fixpoint
    * iteration's checkpointed output can't be deduped by Spark's
    * plan-equality cache (every invocation builds fresh checkpoint
    * RDDs), so the sharing is explicit. At warehouse scale this is the
    * write-once `cluster_labels` table both downstream reports read.
    *
    * Entries hold checkpoint RDDs for the JVM lifetime by design (the
    * gate harness runs one session); a long-lived service recycling
    * sessions over many dirs should call [[clearClusterLabels]] when a
    * dir's labels are no longer needed.
    */
  private val ccMemo = new graft.functions.DataFrameMemo
  private def clusterLabels(s: SparkSession, dir: String): DataFrame =
    ccMemo.getOrBuild(s, dir)(
      graft.functions.ConnectedComponents.minLabels(
        docs(s, dir).select(col("doc_id")), "doc_id",
        bandedCandidates(s, dir), "a_id", "b_id"))

  /** One row per near-dup cluster: (cluster_id, rep_id, sz) — the
    * keeper (longest text, doc_id tie-break) and the cluster size.
    * Shared by the dedup_cluster_rep gate and the near-dup corpus
    * curation pipeline ([[PipelineOps]] curate_corpus_near).
    *
    * One map-side-combinable hash aggregate — NOT a per-cluster window
    * (the previous count + row_number pair shuffled AND sorted every
    * member row of every cluster to keep one): `max_by` under
    * (n_chars, -doc_id) is the top-1 fold, so a giant cluster reduces
    * on the map side like any aggregation.
    */
  private[operators] def clusterReps(s: SparkSession, dir: String)
      : DataFrame =
    clusterLabels(s, dir)
      .select(col("doc_id"), col("label").as("cluster_id"))
      .join(docs(s, dir).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id")))
          .as("rep_id"),
        count(lit(1)).as("sz"))

  /** Release memoized cluster labels — all entries of `session`, or
    * every entry when called with None. Cached blocks are unpersisted
    * on removal; checkpoint files follow the
    * [[graft.functions.Materialize]] retention contract.
    */
  def clearClusterLabels(session: Option[SparkSession] = None): Unit =
    ccMemo.clear(session)

  /** Unpersist every dedup cache for (s, dir): the plan-keyed
    * signature/candidate/gram caches plus both memos. Last consumer is
    * PipelineOps (curate_corpus_near reads [[clusterReps]], which reads
    * the banded-candidate chain) — callers must not release before
    * that section has run.
    */
  /** Rarest-first-ordered gram arrays + prefix length for the exact
    * prefix-filter join: one df pass + one collect per (session, dir)
    * — the pref self-join and both verify joins all read this one
    * build (plan-keyed cache; released with the section).
    */
  private def orderedGrams(s: SparkSession, dir: String): DataFrame = {
    val tok = gramSets(s, dir)
      .select(col("doc_id"), explode(col("gs")).as("tk"))
    val dfreq = tok.groupBy(col("tk")).agg(count(lit(1)).as("dfc"))
    tok.join(dfreq, Seq("tk"))
      .groupBy(col("doc_id"))
      .agg(expr("transform(sort_array(collect_list(struct(dfc, tk)))," +
        " x -> x.tk)").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("p", col("n") - expr("(3 * n + 4) div 5") + 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The prefix-filter candidate pairs (distinct doc pairs sharing at
    * least one gram within both prefixes) — the pair surface whose
    * sub-quadratic growth the scaling evidence (graft.Scaling /
    * SCALING.md) measures; the dedup_prefix_filter gate verifies
    * exactly these candidates.
    */
  private[graft] def prefixCandidates(s: SparkSession, dir: String): DataFrame = {
    val pref = orderedGrams(s, dir)
      .select(col("doc_id"), explode(expr("slice(toks, 1, p)")).as("tk"))
    pref.select(col("tk"), col("doc_id").as("doc_a"))
      .join(pref.select(col("tk"), col("doc_id").as("doc_b")), Seq("tk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Candidate-pair surface of [[dedup_ngram_jaccard]]: the DISTINCT
    * blocked doc pairs sharing ≥ 1 under-ceiling word-3-gram — the
    * `inter` grouping rows BEFORE the jaccard ≥ 0.02 cut, i.e. every
    * pair the verify stage would score. This is the surface the
    * df-ceiling (MaxNgramDf) bounds by construction: ≤ C(MaxNgramDf,2)
    * pairs per posting list however hot the n-gram. Counted by
    * graft.Scaling (SCALING.md).
    */
  private[graft] def ngramCandidates(s: SparkSession, dir: String): DataFrame =
    buildNgramPosting(s, dir)
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)),
          |    y -> named_struct('a', x, 'b', y))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .distinct()

  /** Candidate-pair surface of [[dedup_tfidf_cosine]]: the DISTINCT
    * doc pairs co-occurring in ≥ 1 df∈[2,16] posting list — every pair
    * the integer-cosine verify stage scores. The df ceiling bounds
    * each list's contribution at C(16,2) pairs, so the surface tracks
    * posting-list count, never corpus². Counted by graft.Scaling.
    */
  private[graft] def tfidfCandidates(s: SparkSession, dir: String): DataFrame = {
    val posts = tfidfPosts(s, dir)
    posts.select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  private[graft] def releaseCaches(s: SparkSession, dir: String): Unit = {
    orderedGrams(s, dir).unpersist(blocking = true)
    minhashSig(s, dir).unpersist(blocking = true)
    bandedCandidates(s, dir).unpersist(blocking = true)
    gramSets(s, dir).unpersist(blocking = true)
    substrGrams(s, dir).unpersist(blocking = true)
    tfidfPosts(s, dir).unpersist(blocking = true)
    clearNgramJaccardPairs(Some(s))
    clearClusterLabels(Some(s))
  }
}
