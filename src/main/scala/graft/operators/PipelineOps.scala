package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the sampling / packing stages between a
  * filtered document set and a training run.
  *
  * Both are deterministic by construction (hash thresholds, prefix
  * sums over a total order) so re-runs and engines agree bit-for-bit:
  * a sampling decision that depends on partitioning or RNG state is a
  * provenance bug at 100 TB.
  */
object PipelineOps {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Per-language keep rates as EXACT integer thresholds against a
    * 32-bit hash: keep iff hash(doc_id) < rate · 2³². Integer
    * comparison, no float boundary — both engines agree on every row.
    */
  val StratThresholds: Seq[(String, Long)] = Seq(
    "en" -> (1L << 32), // 1.0  — keep everything
    "fr" -> (1L << 31), // 0.5
    "de" -> (1L << 31), // 0.5
    "es" -> (1L << 30), // 0.25
    "zh" -> (1L << 30)) // 0.25
  val StratDefault: Long = 429496729L // ⌊0.1 · 2³²⌋ for unlisted langs

  /** Token budget per packed sequence (small so sf0.01 splits packs). */
  val PackBudget = 256

  /** Benchmark-decontamination parameters: the "eval set" is the
    * fixture rows with doc_id ≡ 0 (mod [[EvalModulus]]) — a stand-in
    * for the held-out benchmark table a real pipeline joins against —
    * and overlap is counted over word [[ContamNgram]]-grams (the
    * 8-to-13-gram collision window the published decontamination
    * recipes use).
    */
  val EvalModulus = 7
  val ContamNgram = 8

  /** Sample size for the weighted (priority) sampling gate. */
  val PrioritySampleK = 100

  /** Total sample size for temperature sampling, and the salt fan-out
    * of its two-level per-language top-k.
    */
  val TempSampleK = 200
  val TempSalts = 16

  /** DSIR hashed-feature buckets (the n-gram feature space is hashed
    * into a fixed-size table, so the importance model is a
    * [[DsirBuckets]]-row broadcastable artifact at any corpus size). */
  val DsirBuckets = 1024L

  /** The target domain of the DSIR gate: documents from this source
    * stand in for the high-quality target corpus. */
  val DsirTarget = "src0"

  /** Documents kept by the DSIR selection. */
  val DsirSampleK = 100

  /** Epoch cap for the domain-mixture gate: no source is repeated
    * more than this many times however small it is (the data-repeat
    * ceiling every mixture recipe carries). */
  val MixMaxEpochs = 4L

  /** doc_id → its DISTINCT word-[[ContamNgram]]-grams, built map-side
    * (array_distinct before the explode) — the shared candidate table
    * of both decontamination gates.
    */
  private def contamGrams(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= ContamNgram)
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(sequence(1, size(ts)-${ContamNgram - 1}),
           |  i -> concat_ws(' ', slice(ts, i, $ContamNgram))))""".stripMargin))
        .as("ng"))

  /** Distinct eval-set n-grams, memoized + materialized per
    * (session, dir): the small build side THREE gates probe against
    * (decontaminate, decontaminate_bloom, curate_report). Locally a
    * localCheckpoint; at warehouse scale the write-once eval-ngrams
    * table every decontamination pass scans. Released with the
    * pipeline section ([[releaseCaches]]).
    */
  private val evalGramsMemo = new graft.functions.DataFrameMemo

  private def evalGramsOf(s: SparkSession, dir: String): DataFrame =
    evalGramsMemo.getOrBuild(s, dir)(
      graft.functions.Materialize.stable(
        contamGrams(s, dir)
          .filter(col("doc_id") % EvalModulus === 0)
          .select(col("ng")).distinct()))

  /** Release the memoized eval-gram table — Bench's pipeline-section
    * hook; last consumer is curate_report in this same section.
    */
  private[graft] def releaseCaches(s: SparkSession, dir: String): Unit =
    evalGramsMemo.clear(Some(s))

  /** Per-corpus-doc verdict rows from a (doc_id, n_shared) hits table —
    * the shared output shape of both decontamination gates.
    */
  private def contamVerdicts(s: SparkSession, dir: String,
      hits: DataFrame): DataFrame =
    docs(s, dir)
      .filter(col("doc_id") % EvalModulus =!= 0)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_shared"), lit(0L)) > 0, 1).otherwise(0)
          .as("contaminated"))
      .orderBy(col("doc_id"))

  /** The ONE oracle both decontamination gates compare against — the
    * Bloom variant must be indistinguishable in the relation.
    */
  private def decontaminateOracle: String = {
    val g = (0 until ContamNgram)
      .map(k => s"ts[i+$k]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, string_split(text,' ') AS ts
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id, $g AS ng
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
       |    len(ts)-${ContamNgram - 1})) AS i) gi
       |  WHERE len(ts) >= $ContamNgram),
       |eval_grams AS (
       |  SELECT DISTINCT ng FROM grams WHERE doc_id % $EvalModulus = 0),
       |hits AS (
       |  SELECT g.doc_id AS doc_id, COUNT(*) AS n_shared
       |  FROM grams g JOIN eval_grams e ON g.ng = e.ng
       |  WHERE g.doc_id % $EvalModulus != 0
       |  GROUP BY 1)
       |SELECT d.doc_id AS doc_id,
       |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
       |  CAST(CASE WHEN COALESCE(n_shared, 0) > 0 THEN 1 ELSE 0 END
       |    AS INT) AS contaminated
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $EvalModulus != 0) d
       |LEFT JOIN hits ON hits.doc_id = d.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  def specs: Seq[QuerySpec] = Seq(
    // Stratified downsampling: deterministic per-language quota via a
    // salted md5 of the stable doc id. The hash is uniform and
    // independent of partitioning, so the sample is reproducible
    // across runs, engines, and cluster sizes — and the filter is a
    // map-side predicate (no shuffle at all).
    QuerySpec.sql(
      "sample_stratified", {
        val cases = StratThresholds
          .map { case (l, t) => s"WHEN '$l' THEN $t" }.mkString(" ")
        s"""SELECT doc_id, lang, source, hv
           |FROM (
           |  SELECT doc_id, lang, source,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'),
           |      1, 8)) AS BIGINT) AS hv
           |  FROM documents)
           |WHERE hv < CASE lang $cases ELSE $StratDefault END
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":strat"))), 1, 8),
        16, 10).cast("long")
      val thresh = StratThresholds.foldLeft(
          when(lit(false), lit(0L))) { case (acc, (l, t)) =>
        acc.when(col("lang") === l, lit(t))
      }.otherwise(lit(StratDefault))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), hv.as("hv"))
        .filter(col("hv") < thresh)
        .orderBy(col("doc_id"))
    },

    // Sequence packing: assign each document to a fixed-token-budget
    // pack within its source stream, by exclusive running token count
    // (a document belongs to the pack where its prefix starts). The
    // running sum is the range-partitioned two-pass PrefixSum over the
    // total order (source, doc_id) — NOT a per-source Window, so one
    // hot source cannot serialize onto a single task; the per-source
    // reset is a broadcast join of each source's first offset.
    QuerySpec.sql(
      "text_pack",
      s"""SELECT doc_id, source, n_tok, (cum - n_tok) // $PackBudget AS pack_id
         |FROM (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(SUM(len(string_split(text, ' '))) OVER
         |      (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val cum = graft.functions.PrefixSum.globalCumsum(
        base, Seq(col("source"), col("doc_id")), col("n_tok"), "cum")
      val off = cum.groupBy(col("source"))
        .agg(min(col("cum") - col("n_tok")).as("src_off"))
      cum.join(broadcast(off), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tok"),
          expr(s"(cum - src_off - n_tok) div $PackBudget").as("pack_id"))
        .orderBy(col("doc_id"))
    },

    // Benchmark decontamination: flag corpus documents sharing any
    // word-8-gram with the eval set (the held-out benchmark a training
    // pipeline must not leak). Scale shape: distinct 8-grams per doc
    // are built map-side (array_distinct before the explode), the eval
    // side reduces to a DISTINCT n-gram set — typically millions of
    // rows against the corpus's trillions, so the join is left
    // un-hinted for AQE to broadcast when it fits — and the overlap
    // count is a hash-agg per doc. No windows, no driver loops.
    QuerySpec.sql("decontaminate", decontaminateOracle) { (s, dir) =>
      val grams = contamGrams(s, dir)
      val evalGrams = evalGramsOf(s, dir)
      val hits = grams
        .filter(col("doc_id") % EvalModulus =!= 0)
        .join(evalGrams, Seq("ng"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
      contamVerdicts(s, dir, hits)
    },

    // Bloom-accelerated decontamination: the SAME answer as
    // `decontaminate` (the oracle is literally the same SQL — the
    // probabilistic structure must be invisible in the result), but
    // the corpus side is pre-filtered by Spark's own runtime-filter
    // machinery (BloomFilterAggregate / BloomFilterMightContain, the
    // codegen'd expressions behind spark.sql.optimizer.runtime
    // .bloomFilter) applied EXPLICITLY: the eval set's distinct
    // n-grams fold into one Bloom filter (a bounded driver-side
    // object, like a centroid table — guarded, loud failure if the
    // eval set outgrows the broadcast budget), and only might-contain
    // survivors reach the exact join that removes the false
    // positives. At 100 TB this turns the join's corpus-side shuffle
    // from every n-gram into true-hits + fpp·corpus — the standard
    // semi-join pushdown a decontamination pass needs when the eval
    // set is small and the corpus is not. No UDF: both sides stay
    // whole-stage-codegen'd Catalyst expressions over xxhash64 keys.
    QuerySpec.sql("decontaminate_bloom", decontaminateOracle) { (s, dir) =>
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      val grams = contamGrams(s, dir)
      // the distinct eval-gram set is read three times (count, filter
      // build, exact join) — the shared (session, dir) memo
      val evalGrams = evalGramsOf(s, dir)
      // the filter itself: distributed partial filters OR-merged by the
      // TypedImperativeAggregate; ONE bounded row reaches the driver.
      // Over ZERO rows the aggregate evaluates to null — an empty eval
      // set flags nothing, so skip the probe instead of NPE-ing on it
      val nEval = math.max(evalGrams.count(), 1L)
      val bf = evalGrams
        .select(column(new BloomFilterAggregate(
          expression(xxhash64(col("ng"))), nEval).toAggregateExpression)
          .as("bf"))
        .head.getAs[Array[Byte]](0)
      val candidates =
        if (bf == null) grams.filter(lit(false))
        else {
          require(bf.length < (64 << 20),
            s"decontaminate_bloom: serialized filter ${bf.length}B exceeds " +
              "the broadcast budget - eval set too large for the Bloom " +
              "path, use the plain decontaminate join")
          grams
            .filter(col("doc_id") % EvalModulus =!= 0)
            .filter(column(BloomFilterMightContain(
              expression(lit(bf)), expression(xxhash64(col("ng"))))))
        }
      val hits = candidates
        .join(evalGrams, Seq("ng")) // exact: false positives die here
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
      contamVerdicts(s, dir, hits)
    },

    // Two-phase anneal mixing plan — the "decay phase" recipe modern
    // pretraining runs use: 90% of the token budget follows the
    // natural source masses; the final 10% TILTS toward quality
    // (allocation ∝ mass·quality², so a source twice as clean gets 4×
    // its fair share of the anneal). Per-doc quality is the exact
    // integer permille of curate_quality_sweep, mass-weighted to a
    // per-source score; every budget line is integer arithmetic over
    // the source-grain table (wide products in DECIMAL(38,0) ≡
    // HUGEINT), so the whole schedule hash-compares. One token scan,
    // then a |sources|-row plan.
    QuerySpec.sql(
      "curate_mix_anneal",
      """WITH q AS (
        |  SELECT doc_id, source,
        |    (300 * CAST(SUM(CASE WHEN tok IN
        |        ('the','a','of','and','is','to','in')
        |        THEN 1 ELSE 0 END) AS BIGINT)
        |     + 700 * CAST(COUNT(DISTINCT tok) AS BIGINT))
        |      // CAST(COUNT(*) AS BIGINT) AS q_pm,
        |    CAST(COUNT(*) AS BIGINT) AS n_tok
        |  FROM (SELECT doc_id, source,
        |          unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS m,
        |    CAST(SUM(q_pm * n_tok) // SUM(n_tok) AS BIGINT) AS q_pm
        |  FROM q GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(m) AS BIGINT) AS mt,
        |    CAST(SUM(CAST(m AS HUGEINT) * q_pm * q_pm) AS HUGEINT) AS w
        |  FROM s)
        |SELECT source, m AS n_tokens, q_pm,
        |  CAST(CAST(mt * 9 // 10 AS HUGEINT) * m // mt AS BIGINT)
        |    AS phase1_tokens,
        |  CAST(CAST(mt // 10 AS HUGEINT)
        |    * (CAST(m AS HUGEINT) * q_pm * q_pm) // w AS BIGINT)
        |    AS phase2_tokens,
        |  CAST(CASE WHEN mt // w >= 9
        |      AND CAST(q_pm AS HUGEINT) * q_pm * mt * 1000000 >=
        |        CAST(9000000000000000000 AS HUGEINT) * w
        |    THEN CAST(error('curate_mix_anneal: quality boost'
        |      || ' exceeds the int64 ppm envelope') AS HUGEINT)
        |    ELSE CAST(m AS HUGEINT) * q_pm * q_pm * mt * 1000000
        |    // (w * m) END AS BIGINT) AS boost_ppm
        |FROM s CROSS JOIN t
        |ORDER BY source""".stripMargin) { (s, dir) =>
      val q = docs(s, dir)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("ts"))
        .select(col("source"),
          expr("CAST(size(filter(ts, t -> t IN " +
            "('the','a','of','and','is','to','in'))) AS BIGINT)")
            .as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"),
          size(col("ts")).cast("long").as("n_tokens"))
        .select(col("source"),
          expr("(300 * n_stop + 700 * n_distinct) div n_tokens")
            .as("q_pm"),
          col("n_tokens").as("n_tok"))
      val src = q.groupBy(col("source"))
        .agg(sum(col("n_tok")).cast("long").as("m"),
          expr("CAST(SUM(q_pm * n_tok) div SUM(n_tok) AS BIGINT)")
            .as("q_pm"))
      val tot = src.agg(sum(col("m")).cast("long").as("mt"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * q_pm * q_pm")).as("w"))
      src.crossJoin(broadcast(tot))
        .select(col("source"), col("m").as("n_tokens"), col("q_pm"),
          expr("CAST(CAST(mt * 9 div 10 AS DECIMAL(38,0)) * m div mt" +
            " AS BIGINT)").as("phase1_tokens"),
          expr("CAST(CAST(mt div 10 AS DECIMAL(38,0))" +
            " * (CAST(m AS DECIMAL(38,0)) * q_pm * q_pm) div w" +
            " AS BIGINT)").as("phase2_tokens"),
          // Pre-div envelope guard (r16 div-wrap audit): boost =
          // q_pm²·mt·1e6/w, and with an (almost-)all-zero-quality
          // corpus w can be arbitrarily small relative to mt — the
          // one shape where this quotient passes 2⁶³ and Spark's
          // decimal div WRAPS silently where the oracle's HUGEINT→
          // BIGINT cast errors. The mt div w ≥ 9 pre-condition is
          // necessary for any wrap (q_pm ≤ 1000 ⇒ mt/w ≥ 9.2 at the
          // wrap point) and bounds w ≤ mt/9 ≤ 1e18, so the guarded
          // decimal compare 9e18·w can never itself overflow; the
          // compare is mirrored verbatim as the oracle's error()
          // branch.
          expr("CAST(CASE WHEN mt div w >= 9" +
            " AND CAST(q_pm AS DECIMAL(38,0)) * q_pm * mt * 1000000" +
            " >= CAST(9000000000000000000 AS DECIMAL(38,0)) * w" +
            " THEN raise_error(concat('curate_mix_anneal: quality'," +
            " ' boost exceeds the int64 ppm envelope'))" +
            " ELSE CAST(m AS DECIMAL(38,0)) * q_pm * q_pm * mt" +
            " * 1000000 div (w * m) END AS BIGINT)").as("boost_ppm"))
        .orderBy(col("source"))
    },

    // Contamination severity from the EVAL side — decontaminate
    // answers "which train docs must go"; a benchmark owner asks the
    // reverse: per eval document, how much of it leaked (n-grams found
    // in ANY train doc) and how widely (distinct train docs sharing an
    // n-gram). An eval item with leak_ppm ≈ 1e6 is memorized verbatim
    // somewhere and its benchmark score is meaningless. Same distinct-
    // gram surface as the decontamination gates (map-side per-doc
    // grams, the n-gram is the one shuffle key); severity is two
    // COUNT(DISTINCT) folds over the match surface.
    QuerySpec.sql(
      "curate_contamination_report", {
        val g = (0 until ContamNgram)
          .map(k => s"ts[i+$k]").mkString(" || ' ' || ")
        s"""WITH toks AS (SELECT doc_id, string_split(text,' ') AS ts
           |  FROM documents),
           |grams AS (
           |  SELECT DISTINCT doc_id, $g AS ng
           |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
           |    len(ts)-${ContamNgram - 1})) AS i) gi
           |  WHERE len(ts) >= $ContamNgram),
           |ev AS (SELECT doc_id, ng FROM grams
           |  WHERE doc_id % $EvalModulus = 0),
           |tr AS (SELECT doc_id AS train_id, ng FROM grams
           |  WHERE doc_id % $EvalModulus != 0),
           |base AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
           |  FROM ev GROUP BY 1),
           |leak AS (
           |  SELECT ev.doc_id,
           |    CAST(COUNT(DISTINCT ev.ng) AS BIGINT) AS n_leaked,
           |    CAST(COUNT(DISTINCT train_id) AS BIGINT) AS n_train_docs
           |  FROM ev JOIN tr ON ev.ng = tr.ng
           |  GROUP BY 1)
           |SELECT base.doc_id AS doc_id, n_grams,
           |  CAST(COALESCE(n_leaked, 0) AS BIGINT) AS n_leaked,
           |  CAST(COALESCE(n_train_docs, 0) AS BIGINT) AS n_train_docs,
           |  COALESCE(n_leaked, 0) * 1000000 // n_grams AS leak_ppm
           |FROM base LEFT JOIN leak ON leak.doc_id = base.doc_id
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val ev = contamGrams(s, dir)
        .filter(col("doc_id") % EvalModulus === 0)
      val tr = contamGrams(s, dir)
        .filter(col("doc_id") % EvalModulus =!= 0)
        .select(col("doc_id").as("train_id"), col("ng"))
      val base = ev.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"))
      val leak = ev.join(tr, Seq("ng"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("ng")).as("n_leaked"),
          countDistinct(col("train_id")).as("n_train_docs"))
      base.join(leak, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_leaked"), lit(0L)).as("n_leaked"),
          coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
          expr("COALESCE(n_leaked, 0) * 1000000 div n_grams")
            .as("leak_ppm"))
        .orderBy(col("doc_id"))
    },

    // Weighted sampling by PRIORITY SAMPLING (Duffield-Lund-Thorup):
    // priority = uniform-hash / weight, keep the k smallest — inclusion
    // probability proportional to weight, deterministic (hash of the
    // stable id, no RNG state), and single-op IEEE division so both
    // engines compute bit-identical priorities. Spark's orderBy+limit
    // plans as TakeOrderedAndProject: per-partition top-k heaps, only
    // k rows per partition reach the driver-side merge — the
    // scale-correct global top-k (no global sort).
    QuerySpec.sql(
      "sample_priority",
      s"""SELECT doc_id, lang, w, pri FROM (
         |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w,
         |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':prio'),
         |      1, 8)) AS BIGINT) AS DOUBLE) / CAST(n_chars AS DOUBLE) AS pri
         |  FROM documents)
         |ORDER BY pri, doc_id LIMIT $PrioritySampleK""".stripMargin) { (s, dir) =>
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":prio"))), 1, 8),
        16, 10).cast("long")
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("w"),
          (hv.cast("double") / col("n_chars").cast("double")).as("pri"))
        .orderBy(col("pri"), col("doc_id"))
        .limit(PrioritySampleK)
    },

    // Deterministic global shuffle + balanced shard plan — the FINAL
    // step of dataset prep (the WebDataset/TFRecord shard writer):
    // examples are permuted by an engine-portable hash (no RNG
    // state), globally ranked through the range-partitioned two-pass
    // PrefixSum (no single-task sort), and dealt round-robin into 16
    // shards — per-shard doc counts are ±1 BY CONSTRUCTION, unlike
    // hash-mod sharding which only balances in expectation. Emitted
    // per shard: size, token mass, and the token-balance factor in
    // ppm (the number that says whether token-budget training steps
    // stay uniform across shards).
    QuerySpec.sql(
      "curate_shuffle_shards",
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':shuffle'), 1, 8)) AS BIGINT) AS hv,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tok,
        |    ROW_NUMBER() OVER (ORDER BY hv, doc_id) AS rk
        |  FROM h),
        |s AS (
        |  SELECT CAST((rk - 1) % 16 AS BIGINT) AS shard_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM r GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM s)
        |SELECT shard_id, n_docs, n_tokens,
        |  (n_tokens * 16 * 1000000) // tt AS token_balance_ppm
        |FROM s, t
        |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":shuffle"))), 1, 8),
        16, 10).cast("long")
      val h = docs(s, dir)
        .select(col("doc_id"), hv.as("hv"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val ranked = graft.functions.PrefixSum.globalCumsum(
        h, Seq(col("hv"), col("doc_id")), lit(1L), "rk")
      val shards = ranked
        .groupBy(((col("rk") - 1) % 16).as("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens"))
      val tot = shards.agg(sum(col("n_tokens")).cast("long").as("tt"))
      shards.crossJoin(broadcast(tot))
        .select(col("shard_id"), col("n_docs"), col("n_tokens"),
          expr("(n_tokens * 16 * 1000000) div tt").as("token_balance_ppm"))
        .orderBy(col("shard_id"))
    },

    // Quality-threshold sweep — the yield curve a curation pass reads
    // BEFORE committing to a cut: for each candidate threshold, how
    // many documents and tokens survive, and the token yield in ppm of
    // the corpus. The per-doc score is the text_quality_score blend
    // quantized to exact integer permille ((300·n_stop + 700·n_distinct)
    // div n_tokens), so every threshold comparison is integer-exact in
    // both engines. One map-side pass over documents → a ≤1001-row
    // score histogram; the 11-threshold grid multiplies the HISTOGRAM,
    // never the corpus — the sweep costs one scan at any scale.
    QuerySpec.sql(
      "curate_quality_sweep",
      """WITH q AS (
        |  SELECT doc_id,
        |    (300 * CAST(SUM(CASE WHEN tok IN
        |        ('the','a','of','and','is','to','in')
        |        THEN 1 ELSE 0 END) AS BIGINT)
        |     + 700 * CAST(COUNT(DISTINCT tok) AS BIGINT))
        |      // CAST(COUNT(*) AS BIGINT) AS q_pm,
        |    CAST(COUNT(*) AS BIGINT) AS n_tok
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id),
        |b AS (
        |  SELECT q_pm, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM q GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM b),
        |g AS (SELECT UNNEST(range(0, 1001, 100)) AS threshold_pm),
        |k AS (
        |  SELECT threshold_pm,
        |    CAST(COALESCE(SUM(CASE WHEN q_pm >= threshold_pm
        |      THEN n_docs END), 0) AS BIGINT) AS kept_docs,
        |    CAST(COALESCE(SUM(CASE WHEN q_pm >= threshold_pm
        |      THEN n_tokens END), 0) AS BIGINT) AS kept_tokens
        |  FROM g CROSS JOIN b GROUP BY 1)
        |SELECT CAST(threshold_pm AS BIGINT) AS threshold_pm, kept_docs,
        |  kept_tokens,
        |  CAST(kept_tokens * 1000000 // tt AS BIGINT) AS token_yield_ppm
        |FROM k CROSS JOIN tot
        |ORDER BY threshold_pm""".stripMargin) { (s, dir) =>
      val perDoc = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(
          expr("CAST(size(filter(ts, t -> t IN " +
            "('the','a','of','and','is','to','in'))) AS BIGINT)")
            .as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"),
          size(col("ts")).cast("long").as("n_tokens"))
        .select(expr("(300 * n_stop + 700 * n_distinct) div n_tokens")
            .as("q_pm"),
          col("n_tokens").as("n_tok"))
      val hist = perDoc.groupBy(col("q_pm"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens"))
      val tot = hist.agg(sum(col("n_tokens")).cast("long").as("tt"))
      val grid = s.range(0, 11)
        .select((col("id") * 100).cast("long").as("threshold_pm"))
      grid.crossJoin(broadcast(hist))
        .groupBy(col("threshold_pm"))
        .agg(coalesce(sum(when(col("q_pm") >= col("threshold_pm"),
            col("n_docs"))), lit(0L)).as("kept_docs"),
          coalesce(sum(when(col("q_pm") >= col("threshold_pm"),
            col("n_tokens"))), lit(0L)).as("kept_tokens"))
        .crossJoin(broadcast(tot))
        .select(col("threshold_pm"), col("kept_docs"), col("kept_tokens"),
          expr("kept_tokens * 1000000 div tt").as("token_yield_ppm"))
        .orderBy(col("threshold_pm"))
    },

    // Per-key weighted sampling: Duffield-Lund-Thorup priority
    // sampling STRATIFIED by source — every domain contributes its
    // own weighted sample (the per-domain eval-slice builder), not
    // just the global head. Same exactness discipline as
    // sample_priority (engine-portable md5 hash, ONE IEEE division),
    // but the selection runs through the native TopKPerKey heap: a
    // domain with a billion docs costs a bounded heap per partition,
    // never a per-domain sort.
    QuerySpec.sql(
      "sample_priority_per_key",
      """SELECT source, doc_id, w, pri, rnk FROM (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':prio'),
        |      1, 8)) AS BIGINT) AS DOUBLE) / CAST(n_chars AS DOUBLE) AS pri,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY
        |        CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':prio'),
        |          1, 8)) AS BIGINT) AS DOUBLE) / CAST(n_chars AS DOUBLE),
        |        doc_id) AS rnk
        |  FROM documents)
        |WHERE rnk <= 10
        |ORDER BY source, rnk""".stripMargin) { (s, dir) =>
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":prio"))), 1, 8),
        16, 10).cast("long")
      val scored = docs(s, dir)
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("w"),
          (hv.cast("double") / col("n_chars").cast("double")).as("pri"))
      graft.plans.TopKPerKey.topKRanked(scored, Seq("source"),
          Seq("pri" -> false, "doc_id" -> false), 10, "rnk")
        .select(col("source"), col("doc_id"), col("w"), col("pri"),
          col("rnk"))
        .orderBy(col("source"), col("rnk"))
    },

    // Data Selection via Importance Resampling (Xie et al. 2023):
    // score every document by how much more likely its hashed n-gram
    // features are under a TARGET domain (here the [[DsirTarget]]
    // source, standing in for the high-quality corpus) than under the
    // raw proposal corpus, and keep the top [[DsirSampleK]]. Word
    // features hash into [[DsirBuckets]] buckets; the per-bucket
    // log-ratio λ_b = ln((tc_b+1)(qtot+B) / ((ttot+B)(qc_b+1)))
    // (add-one smoothing on both distributions) is rounded to
    // 6-decimal integer micros — the [[TextOps]] LM-gate trick — so a
    // document's log importance weight Σ λ is exact long arithmetic
    // and hash-compares across engines.
    //
    // Scale shape: feature hashing is map-side; both bucket-count
    // aggregates are map-side-combinable over ≤ B uniform keys; the
    // fitted model (λ table) is B rows — BROADCAST back to the token
    // stream, one hash aggregate per doc, TakeOrderedAndProject for
    // the selection. The corpus is scanned twice (fit + score), never
    // shuffled by anything finer than the B-bucket id.
    QuerySpec.sql(
      "sample_dsir",
      s"""WITH tb AS (
         |  SELECT doc_id, source,
         |    CAST(('0x' || substr(md5(tok || ':dsir'), 1, 8)) AS BIGINT)
         |      % $DsirBuckets AS b
         |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
         |        FROM documents) t0),
         |cnt AS (
         |  SELECT b, CAST(COUNT(*) AS BIGINT) AS qc,
         |    CAST(SUM(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tc
         |  FROM tb GROUP BY b),
         |tot AS (
         |  SELECT CAST(SUM(qc) AS BIGINT) AS qtot,
         |    CAST(SUM(tc) AS BIGINT) AS ttot
         |  FROM cnt),
         |lam AS (
         |  SELECT cnt.b,
         |    CAST(CAST(ln(
         |      CAST((cnt.tc + 1) * (tot.qtot + $DsirBuckets) AS DOUBLE)
         |      / CAST((tot.ttot + $DsirBuckets) * (cnt.qc + 1) AS DOUBLE))
         |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS lam
         |  FROM cnt CROSS JOIN tot),
         |w AS (
         |  SELECT tb.doc_id, CAST(SUM(l.lam) AS BIGINT) AS w_micros
         |  FROM tb JOIN lam l ON l.b = tb.b
         |  GROUP BY tb.doc_id)
         |SELECT d.doc_id, d.lang, d.source, w.w_micros
         |FROM w JOIN documents d ON d.doc_id = w.doc_id
         |ORDER BY w.w_micros DESC, d.doc_id LIMIT $DsirSampleK""".stripMargin) {
      (s, dir) =>
      val tb = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("source"),
          (graft.functions.Md5Prefix.md5_prefix_long(
            concat(col("tok"), lit(":dsir"))) % DsirBuckets).as("b"))
      // both distributions counted in ONE pass over the token stream
      // (qc = proposal count, tc = target count per bucket)
      val cnt = tb.groupBy(col("b")).agg(count(lit(1)).as("qc"),
        sum(when(col("source") === DsirTarget, 1L).otherwise(0L)).as("tc"))
      val tot = cnt.agg(sum(col("qc")).as("qtot"), sum(col("tc")).as("ttot"))
      val lam = cnt.crossJoin(broadcast(tot))
        .select(col("b"), graft.functions.Cols.micros6(log(
          ((col("tc") + 1) * (col("qtot") + DsirBuckets)).cast("double") /
          ((col("ttot") + DsirBuckets) * (col("qc") + 1)).cast("double")))
          .as("lam"))
      val w = tb.join(broadcast(lam), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("lam")).cast("long").as("w_micros"))
      docs(s, dir).join(w, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("w_micros"))
        .orderBy(col("w_micros").desc, col("doc_id"))
        .limit(DsirSampleK)
    },

    // Per-domain distribution drift: smoothed KL divergence of each
    // source's hashed word-bucket distribution from the whole corpus —
    // the mixture diagnostic that flags which domain is most unlike
    // the rest (and how much a mixture reweighting changes the blend).
    // Exactness: each bucket's log-ratio is rounded to integer micros
    // (the DSIR/LM trick); the KL numerator Σ (sc+1)·λ_b is then an
    // exact long, and the reported KL divides two exact operands —
    // hash-identical across engines.
    //
    // Scale shape: one token-hash pass → one (source, bucket) hash
    // aggregate (≤ sources·B uniform keys, map-side combinable); the
    // sources × buckets grid is ≤ sources·B rows of pure arithmetic
    // (broadcast joins); nothing else touches the corpus.
    QuerySpec.sql(
      "corpus_kl_drift",
      s"""WITH tb AS (
         |  SELECT source,
         |    CAST(('0x' || substr(md5(tok || ':dsir'), 1, 8)) AS BIGINT)
         |      % $DsirBuckets AS b
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
         |        FROM documents) t0),
         |qc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS qc FROM tb GROUP BY b),
         |qt AS (SELECT CAST(COUNT(*) AS BIGINT) AS qtot FROM tb),
         |sc AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS sc
         |       FROM tb GROUP BY source, b),
         |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS stot
         |       FROM tb GROUP BY source),
         |grid AS (
         |  SELECT s.source, s.stot, q.b, q.qc, t.qtot,
         |    COALESCE(c.sc, 0) AS sc
         |  FROM st s
         |  CROSS JOIN qc q
         |  CROSS JOIN qt t
         |  LEFT JOIN sc c ON c.source = s.source AND c.b = q.b),
         |terms AS (
         |  SELECT source, stot,
         |    (sc + 1) * CAST(CAST(ln(
         |      CAST((sc + 1) * (qtot + $DsirBuckets) AS DOUBLE)
         |      / CAST((stot + $DsirBuckets) * (qc + 1) AS DOUBLE))
         |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS term
         |  FROM grid)
         |SELECT source,
         |  CAST(SUM(term) AS BIGINT) AS kl_num_micros,
         |  CAST(SUM(term) AS DOUBLE)
         |    / (CAST(stot + $DsirBuckets AS DOUBLE) * 1000000) AS kl
         |FROM terms
         |GROUP BY source, stot
         |ORDER BY kl DESC, source""".stripMargin) { (s, dir) =>
      val tb = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .select(col("source"),
          (graft.functions.Md5Prefix.md5_prefix_long(
            concat(col("tok"), lit(":dsir"))) % DsirBuckets).as("b"))
      val qc = tb.groupBy(col("b")).agg(count(lit(1)).as("qc"))
      val qt = qc.agg(sum(col("qc")).as("qtot"))
      val sc = tb.groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("sc"))
      val st = sc.groupBy(col("source")).agg(sum(col("sc")).as("stot"))
      val grid = st
        .crossJoin(broadcast(qc))
        .crossJoin(broadcast(qt))
        .join(sc, Seq("source", "b"), "left")
        .withColumn("sc", coalesce(col("sc"), lit(0L)))
      val terms = grid.select(col("source"), col("stot"),
        ((col("sc") + 1) * graft.functions.Cols.micros6(log(
          ((col("sc") + 1) * (col("qtot") + DsirBuckets)).cast("double") /
          ((col("stot") + DsirBuckets) * (col("qc") + 1)).cast("double"))))
          .as("term"))
      terms.groupBy(col("source"), col("stot"))
        .agg(sum(col("term")).cast("long").as("kl_num_micros"))
        .select(col("source"), col("kl_num_micros"),
          (col("kl_num_micros").cast("double") /
            ((col("stot") + DsirBuckets).cast("double") * lit(1000000.0)))
            .as("kl"))
        .orderBy(col("kl").desc, col("source"))
    },

    // Deterministic epoch-weighted domain mixture: materialize the
    // training blend where every source contributes an equal token
    // share, by REPEATING small high-quality domains (integer epochs +
    // a hash-selected fractional epoch) and never exceeding
    // [[MixMaxEpochs]] — the data-repetition stage of corpus assembly
    // (small domains epoch up, huge domains implicitly downsample at
    // the fractional-epoch hash). All arithmetic is integer micros
    // Jensen–Shannon divergence of each source against the REST of
    // the corpus — the symmetric, bounded companion of the KL drift
    // gate (KL explodes when a bucket is one-sided; JS caps at ln 2,
    // which is what a mixture-rebalancing loop wants to rank on).
    // Same hashed-vocabulary buckets and Laplace smoothing as
    // corpus_kl_drift; every ln argument is a ratio of exact integer
    // products (2·p/(p+q) cross-multiplied), each term rounds to
    // integer micros before the sum, so the divergence hash-compares.
    QuerySpec.sql(
      "corpus_js_divergence",
      s"""WITH tb AS (
         |  SELECT source,
         |    CAST(('0x' || substr(md5(tok || ':dsir'), 1, 8)) AS BIGINT)
         |      % $DsirBuckets AS b
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
         |        FROM documents) t0),
         |qc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS qc FROM tb GROUP BY b),
         |qt AS (SELECT CAST(COUNT(*) AS BIGINT) AS qtot FROM tb),
         |sc AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS sc
         |       FROM tb GROUP BY source, b),
         |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS stot
         |       FROM tb GROUP BY source),
         |grid AS (
         |  SELECT s.source, s.stot, q.b, t.qtot,
         |    COALESCE(c.sc, 0) + 1 AS p,
         |    q.qc - COALESCE(c.sc, 0) + 1 AS r,
         |    s.stot + $DsirBuckets AS pn,
         |    t.qtot - s.stot + $DsirBuckets AS rn
         |  FROM st s
         |  CROSS JOIN qc q
         |  CROSS JOIN qt t
         |  LEFT JOIN sc c ON c.source = s.source AND c.b = q.b),
         |terms AS (
         |  SELECT source, pn, rn,
         |    p * CAST(CAST(ln(CAST(2 * p * rn AS DOUBLE)
         |        / CAST(p * rn + r * pn AS DOUBLE))
         |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS tp,
         |    r * CAST(CAST(ln(CAST(2 * r * pn AS DOUBLE)
         |        / CAST(p * rn + r * pn AS DOUBLE))
         |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS tq
         |  FROM grid)
         |SELECT source,
         |  CAST(SUM(tp) AS BIGINT) AS js_p_micros,
         |  CAST(SUM(tq) AS BIGINT) AS js_q_micros,
         |  (CAST(SUM(tp) AS DOUBLE) / CAST(pn AS DOUBLE)
         |    + CAST(SUM(tq) AS DOUBLE) / CAST(rn AS DOUBLE))
         |    / CAST(2000000 AS DOUBLE) AS js
         |FROM terms
         |GROUP BY source, pn, rn
         |ORDER BY js DESC, source""".stripMargin) { (s, dir) =>
      val tb = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .select(col("source"),
          (graft.functions.Md5Prefix.md5_prefix_long(
            concat(col("tok"), lit(":dsir"))) % DsirBuckets).as("b"))
      val qc = tb.groupBy(col("b")).agg(count(lit(1)).as("qc"))
      val qt = qc.agg(sum(col("qc")).as("qtot"))
      val sc = tb.groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("sc"))
      val st = sc.groupBy(col("source")).agg(sum(col("sc")).as("stot"))
      val grid = st
        .crossJoin(broadcast(qc))
        .crossJoin(broadcast(qt))
        .join(sc, Seq("source", "b"), "left")
        .select(col("source"),
          (coalesce(col("sc"), lit(0L)) + 1).as("p"),
          (col("qc") - coalesce(col("sc"), lit(0L)) + 1).as("r"),
          (col("stot") + DsirBuckets).as("pn"),
          (col("qtot") - col("stot") + DsirBuckets).as("rn"))
      grid
        .select(col("source"), col("pn"), col("rn"),
          (col("p") * expr("CAST(CAST(ln(CAST(2 * p * rn AS DOUBLE)" +
            " / CAST(p * rn + r * pn AS DOUBLE))" +
            " AS DECIMAL(18,6)) * 1000000 AS BIGINT)")).as("tp"),
          (col("r") * expr("CAST(CAST(ln(CAST(2 * r * pn AS DOUBLE)" +
            " / CAST(p * rn + r * pn AS DOUBLE))" +
            " AS DECIMAL(18,6)) * 1000000 AS BIGINT)")).as("tq"))
        .groupBy(col("source"), col("pn"), col("rn"))
        .agg(sum(col("tp")).as("js_p_micros"),
          sum(col("tq")).as("js_q_micros"))
        .select(col("source"), col("js_p_micros"), col("js_q_micros"),
          ((col("js_p_micros").cast("double") / col("pn").cast("double") +
            col("js_q_micros").cast("double") / col("rn").cast("double"))
            / lit(2000000.0)).as("js"))
        .orderBy(col("js").desc, col("source"))
    },

    // (repeat factor = floor(target·1e6 / source_tokens), capped);
    // membership of the fractional copy is a salted-hash threshold —
    // reproducible on any cluster, no RNG state.
    //
    // Scale shape: per-source token totals are one hash aggregate;
    // the per-source repeat factor is a ≤|sources|-row broadcast; copy
    // materialization is a pure per-doc flatMap (sequence + explode).
    QuerySpec.sql(
      "mix_domains",
      s"""WITH st AS (
         |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
         |    AS s_toks
         |  FROM documents GROUP BY source),
         |tgt AS (
         |  SELECT CAST(SUM(s_toks) // COUNT(*) AS BIGINT) AS t_toks FROM st),
         |rf AS (
         |  SELECT source,
         |    LEAST(CAST(${MixMaxEpochs}000000 AS BIGINT),
         |      CAST(FLOOR(t_toks * 1000000.0 / s_toks) AS BIGINT))
         |      AS r_micros
         |  FROM st CROSS JOIN tgt),
         |assign AS (
         |  SELECT d.doc_id, d.source,
         |    CAST(r.r_micros // 1000000 AS BIGINT)
         |      + CASE WHEN CAST(('0x' || substr(
         |          md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 8)) AS BIGINT)
         |          % 1000000 < r.r_micros % 1000000
         |        THEN 1 ELSE 0 END AS n_copies
         |  FROM documents d JOIN rf r ON r.source = d.source)
         |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
         |FROM assign,
         |  UNNEST(list_slice(generate_series(1, GREATEST(n_copies, 1)),
         |    1, n_copies)) AS u(epoch)
         |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      val st = docs(s, dir)
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("s_toks"))
      val tgt = st.agg(expr("sum(s_toks) div count(1)").as("t_toks"))
      val rf = st.crossJoin(broadcast(tgt))
        .select(col("source"),
          least(lit(MixMaxEpochs * 1000000L),
            floor(col("t_toks") * lit(1000000.0) / col("s_toks"))
              .cast("long")).as("r_micros"))
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":mix"))), 1, 8),
        16, 10).cast("long")
      docs(s, dir).select(col("doc_id"), col("source"))
        .join(broadcast(rf), Seq("source"))
        .withColumn("n_copies",
          expr("r_micros div 1000000L") +
            when(hv % 1000000L < col("r_micros") % 1000000L, 1L)
              .otherwise(0L))
        .select(col("doc_id"), col("source"),
          explode(expr(
            "slice(sequence(1L, greatest(n_copies, 1L)), 1, CAST(n_copies AS INT))"))
            .as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    },

    // Per-domain quality caps — the anti-domination rule every web
    // corpus recipe carries (no source may contribute more than K
    // documents, and the K kept are its BEST): rank each source's
    // docs by an exact-integer quality score (vocabulary diversity in
    // ppm — one integer division, no float), keep the top 20, report
    // the per-source keep stats. The ranking runs through the native
    // TopKPerKey heap plan, so a giant domain costs a bounded heap,
    // never a full per-source sort — the property that matters when
    // one domain is half the crawl.
    QuerySpec.sql(
      "curate_domain_caps",
      """WITH q AS (
        |  SELECT doc_id, source,
        |    CAST(COUNT(*) AS BIGINT) AS n_tok,
        |    (CAST(COUNT(DISTINCT tok) AS BIGINT) * 1000000)
        |      // CAST(COUNT(*) AS BIGINT) AS score
        |  FROM (SELECT doc_id, source,
        |          unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, source),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY score DESC, doc_id) AS rnk
        |  FROM q)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(MIN(score) AS BIGINT) AS min_kept_score,
        |  CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
        |FROM r WHERE rnk <= 20
        |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val q = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_tok"),
          countDistinct(col("tok")).as("n_distinct"))
        .withColumn("score", expr("(n_distinct * 1000000) div n_tok"))
        .drop("n_distinct")
      graft.plans.TopKPerKey.topKRanked(q, Seq("source"),
          Seq("score" -> true, "doc_id" -> false), 20, "rnk")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("score")).cast("long").as("min_kept_score"),
          sum(col("n_tok")).cast("long").as("kept_tokens"))
        .orderBy(col("source"))
    },

    // End-to-end corpus curation in ONE declarative plan — the
    // composition a real training-data job ships: quality filter
    // (stopword + vocabulary-diversity score) → exact-dedup keepers
    // (min doc_id per content digest) → benchmark decontamination
    // (drop eval docs and anything sharing an 8-gram with them) →
    // deterministic train/val/test assignment. Every stage is the
    // already-gated operator; composing them proves the stages stack
    // without materialization barriers (Catalyst sees one tree:
    // map-side quality + split, one digest window, one broadcastable
    // n-gram anti-join).
    QuerySpec.sql(
      "curate_corpus", {
        val g = (0 until ContamNgram)
          .map(k => s"ts[i+$k]").mkString(" || ' ' || ")
        val t1 = (0.90 * (1L << 32)).toLong
        val t2 = (0.95 * (1L << 32)).toLong
        s"""WITH q AS (
           |  SELECT doc_id,
           |    0.3 * (CAST(SUM(CASE WHEN tok IN
           |      ('the','a','of','and','is','to','in')
           |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))
           |    + 0.7 * (CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*))
           |      AS quality
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY doc_id),
           |keep AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id,
           |      MIN(doc_id) OVER (PARTITION BY md5(lower(text))) AS k
           |    FROM documents)
           |  WHERE doc_id = k),
           |toks AS (SELECT doc_id, string_split(text, ' ') AS ts
           |  FROM documents),
           |grams AS (
           |  SELECT DISTINCT doc_id, $g AS ng
           |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
           |    len(ts)-${ContamNgram - 1})) AS i) gi
           |  WHERE len(ts) >= $ContamNgram),
           |eval_grams AS (
           |  SELECT DISTINCT ng FROM grams WHERE doc_id % $EvalModulus = 0),
           |contaminated AS (
           |  SELECT DISTINCT g.doc_id AS doc_id
           |  FROM grams g JOIN eval_grams e ON g.ng = e.ng)
           |SELECT d.doc_id AS doc_id, d.lang AS lang, q.quality AS quality,
           |  CASE WHEN hv < $t1 THEN 'train'
           |       WHEN hv < $t2 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (
           |  SELECT doc_id, lang,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
           |      1, 8)) AS BIGINT) AS hv
           |  FROM documents) d
           |JOIN q ON q.doc_id = d.doc_id
           |JOIN keep ON keep.doc_id = d.doc_id
           |WHERE q.quality >= 0.25
           |  AND d.doc_id % $EvalModulus != 0
           |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val t1 = (0.90 * (1L << 32)).toLong
      val t2 = (0.95 * (1L << 32)).toLong
      val stop = "('the','a','of','and','is','to','in')"
      // stage 1: map-side quality (same per-doc array plan as
      // text_quality_score — no shuffle)
      val quality = docs(s, dir)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ts"),
          md5(lower(col("text"))).as("fp"))
        .withColumn("quality",
          lit(0.3) * (expr(s"CAST(size(filter(ts, t -> t IN $stop)) AS BIGINT)")
            .cast("double") / size(col("ts"))) +
          lit(0.7) * (size(array_distinct(col("ts"))).cast("double") /
            size(col("ts"))))
      // stage 2: exact-dedup keepers (digest window)
      val kept = quality
        .withColumn("keep_id", min(col("doc_id")).over(W.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("keep_id"))
        .filter(col("quality") >= 0.25)
        .filter(col("doc_id") % EvalModulus =!= 0)
      // stage 3: decontamination anti-join (AQE-broadcastable eval set)
      val grams = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= ContamNgram)
        .select(col("doc_id"), explode(expr(
          s"""array_distinct(transform(sequence(1, size(ts)-${ContamNgram - 1}),
             |  i -> concat_ws(' ', slice(ts, i, $ContamNgram))))""".stripMargin))
          .as("ng"))
      // the memoized eval-gram table (shared with the decontaminate
      // gates) — one build per (session, dir), not one per stage plan
      val evalGrams = evalGramsOf(s, dir)
      val contaminated = grams.join(evalGrams, Seq("ng"))
        .select(col("doc_id")).distinct()
      // stage 4: deterministic split assignment (map-side)
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 8),
        16, 10).cast("long")
      kept.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("quality"),
          when(hv < t1, "train").when(hv < t2, "val").otherwise("test")
            .as("split"))
        .orderBy(col("doc_id"))
    },

    // The NEAR-dup curation pipeline: curate_corpus with stage 2
    // The DATA CARD: the stage-by-stage funnel report (docs + tokens
    // surviving raw → exact dedup → quality → eval holdout →
    // decontamination → train split) that every corpus release
    // publishes beside the data. Same predicates as curate_corpus,
    // but folded to cumulative-flag sums in ONE pass over the flags
    // relation — one row per stage, never a per-stage rescan of the
    // corpus. The funnel is the audit trail: any stage dropping "too
    // much" is visible before a token is trained on.
    QuerySpec.sql(
      "curate_report", {
        val g = (0 until ContamNgram)
          .map(k => s"ts[i+$k]").mkString(" || ' ' || ")
        val t1 = (0.90 * (1L << 32)).toLong
        s"""WITH q AS (
           |  SELECT doc_id,
           |    0.3 * (CAST(SUM(CASE WHEN tok IN
           |      ('the','a','of','and','is','to','in')
           |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))
           |    + 0.7 * (CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*))
           |      AS quality
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY doc_id),
           |toks AS (SELECT doc_id, string_split(text, ' ') AS ts
           |  FROM documents),
           |grams AS (
           |  SELECT DISTINCT doc_id, $g AS ng
           |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
           |    len(ts)-${ContamNgram - 1})) AS i) gi
           |  WHERE len(ts) >= $ContamNgram),
           |eval_grams AS (
           |  SELECT DISTINCT ng FROM grams WHERE doc_id % $EvalModulus = 0),
           |contaminated AS (
           |  SELECT DISTINCT g.doc_id AS doc_id
           |  FROM grams g JOIN eval_grams e ON g.ng = e.ng),
           |flags AS (
           |  SELECT d.doc_id,
           |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS ntok,
           |    d.doc_id = MIN(d.doc_id)
           |      OVER (PARTITION BY md5(lower(d.text))) AS ok_dedup,
           |    q.quality >= 0.25 AS ok_q,
           |    d.doc_id % $EvalModulus <> 0 AS ok_eval,
           |    c.doc_id IS NULL AS ok_contam,
           |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
           |      || ':split'), 1, 8)) AS BIGINT) < $t1 AS ok_train
           |  FROM documents d
           |  JOIN q ON q.doc_id = d.doc_id
           |  LEFT JOIN contaminated c ON c.doc_id = d.doc_id),
           |agg AS (SELECT
           |  CAST(COUNT(*) AS BIGINT) AS d0,
           |  CAST(SUM(ntok) AS BIGINT) AS t0,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup THEN 1 END), 0)
           |    AS BIGINT) AS d1,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup THEN ntok END), 0)
           |    AS BIGINT) AS t1,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup AND ok_q
           |    THEN 1 END), 0) AS BIGINT) AS d2,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup AND ok_q
           |    THEN ntok END), 0) AS BIGINT) AS t2,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup AND ok_q AND ok_eval
           |    THEN 1 END), 0) AS BIGINT) AS d3,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup AND ok_q AND ok_eval
           |    THEN ntok END), 0) AS BIGINT) AS t3,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup AND ok_q AND ok_eval
           |    AND ok_contam THEN 1 END), 0) AS BIGINT) AS d4,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup AND ok_q AND ok_eval
           |    AND ok_contam THEN ntok END), 0) AS BIGINT) AS t4,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup AND ok_q AND ok_eval
           |    AND ok_contam AND ok_train THEN 1 END), 0) AS BIGINT)
           |    AS d5,
           |  CAST(COALESCE(SUM(CASE WHEN ok_dedup AND ok_q AND ok_eval
           |    AND ok_contam AND ok_train THEN ntok END), 0) AS BIGINT)
           |    AS t5
           |  FROM flags)
           |SELECT * FROM (
           |  SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
           |    d0 AS n_docs, t0 AS n_tokens FROM agg
           |  UNION ALL SELECT 1, 'exact_dedup', d1, t1 FROM agg
           |  UNION ALL SELECT 2, 'quality', d2, t2 FROM agg
           |  UNION ALL SELECT 3, 'eval_holdout', d3, t3 FROM agg
           |  UNION ALL SELECT 4, 'decontaminated', d4, t4 FROM agg
           |  UNION ALL SELECT 5, 'train_split', d5, t5 FROM agg) u
           |ORDER BY stage""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val t1 = (0.90 * (1L << 32)).toLong
      val stop = "('the','a','of','and','is','to','in')"
      val evalGrams = evalGramsOf(s, dir)
      val contam = contamGrams(s, dir)
        .join(evalGrams, Seq("ng"))
        .select(col("doc_id")).distinct()
        .withColumn("is_contam", lit(true))
      val flags = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"),
          md5(lower(col("text"))).as("fp"))
        .withColumn("ntok", size(col("ts")).cast("long"))
        .withColumn("quality",
          lit(0.3) * (expr(s"CAST(size(filter(ts, t -> t IN $stop)) AS BIGINT)")
            .cast("double") / size(col("ts"))) +
            lit(0.7) * (size(array_distinct(col("ts"))).cast("double") /
              size(col("ts"))))
        .withColumn("ok_dedup",
          col("doc_id") === min(col("doc_id")).over(W.partitionBy(col("fp"))))
        .withColumn("ok_q", col("quality") >= 0.25)
        .withColumn("ok_eval", col("doc_id") % EvalModulus =!= 0)
        .withColumn("ok_train",
          graft.functions.Md5Prefix.md5_prefix_long(
            concat(col("doc_id").cast("string"), lit(":split"))) < t1)
        .join(contam, Seq("doc_id"), "left")
        .withColumn("ok_contam", col("is_contam").isNull)
      val agg = flags.agg(
        count(lit(1)).as("d0"), sum(col("ntok")).as("t0"),
        coalesce(sum(when(col("ok_dedup"), 1L)), lit(0L)).as("d1"),
        coalesce(sum(when(col("ok_dedup"), col("ntok"))), lit(0L))
          .as("t1"),
        coalesce(sum(when(col("ok_dedup") && col("ok_q"), 1L)),
          lit(0L)).as("d2"),
        coalesce(sum(when(col("ok_dedup") && col("ok_q"), col("ntok"))),
          lit(0L)).as("t2"),
        coalesce(sum(when(col("ok_dedup") && col("ok_q") &&
          col("ok_eval"), 1L)), lit(0L)).as("d3"),
        coalesce(sum(when(col("ok_dedup") && col("ok_q") &&
          col("ok_eval"), col("ntok"))), lit(0L)).as("t3"),
        coalesce(sum(when(col("ok_dedup") && col("ok_q") &&
          col("ok_eval") && col("ok_contam"), 1L)), lit(0L)).as("d4"),
        coalesce(sum(when(col("ok_dedup") && col("ok_q") &&
          col("ok_eval") && col("ok_contam"), col("ntok"))), lit(0L))
          .as("t4"),
        coalesce(sum(when(col("ok_dedup") && col("ok_q") &&
          col("ok_eval") && col("ok_contam") && col("ok_train"), 1L)),
          lit(0L)).as("d5"),
        coalesce(sum(when(col("ok_dedup") && col("ok_q") &&
          col("ok_eval") && col("ok_contam") && col("ok_train"),
          col("ntok"))), lit(0L)).as("t5"))
      agg.selectExpr(
        """stack(6,
          |  CAST(0 AS BIGINT), 'raw', d0, t0,
          |  CAST(1 AS BIGINT), 'exact_dedup', d1, t1,
          |  CAST(2 AS BIGINT), 'quality', d2, t2,
          |  CAST(3 AS BIGINT), 'eval_holdout', d3, t3,
          |  CAST(4 AS BIGINT), 'decontaminated', d4, t4,
          |  CAST(5 AS BIGINT), 'train_split', d5, t5)
          |  AS (stage, stage_name, n_docs, n_tokens)""".stripMargin)
        .orderBy(col("stage"))
    },

    // upgraded from exact-digest keepers to cluster representatives —
    // banded-MinHash candidates → connected components → keep the
    // longest doc per near-dup cluster — then the same quality gate,
    // decontamination anti-join, and split assignment. This is the
    // full production shape: LSH + graph clustering feeding the
    // curation decision, composed with the memoized cluster labels
    // (the fixpoint runs once per session/dir across all three
    // consuming gates).
    QuerySpec.sql(
      "curate_corpus_near", {
        val g = (0 until ContamNgram)
          .map(k => s"ts[i+$k]").mkString(" || ' ' || ")
        val t1 = (0.90 * (1L << 32)).toLong
        val t2 = (0.95 * (1L << 32)).toLong
        s"""WITH RECURSIVE ${DedupOps.bandedCandCtes},
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
           |rep AS (
           |  SELECT rep_id FROM (
           |    SELECT d.doc_id AS rep_id,
           |      row_number() OVER (PARTITION BY cc.cluster_id
           |        ORDER BY d.n_chars DESC, d.doc_id) AS rn
           |    FROM cc JOIN documents d ON d.doc_id = cc.doc_id) r0
           |  WHERE rn = 1),
           |q AS (
           |  SELECT doc_id,
           |    0.3 * (CAST(SUM(CASE WHEN tok IN
           |      ('the','a','of','and','is','to','in')
           |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))
           |    + 0.7 * (CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*))
           |      AS quality
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY doc_id),
           |toks AS (SELECT doc_id, string_split(text, ' ') AS ts
           |  FROM documents),
           |grams AS (
           |  SELECT DISTINCT doc_id, $g AS ng
           |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
           |    len(ts)-${ContamNgram - 1})) AS i) gi
           |  WHERE len(ts) >= $ContamNgram),
           |eval_grams AS (
           |  SELECT DISTINCT ng FROM grams WHERE doc_id % $EvalModulus = 0),
           |contaminated AS (
           |  SELECT DISTINCT g.doc_id AS doc_id
           |  FROM grams g JOIN eval_grams e ON g.ng = e.ng)
           |SELECT d.doc_id AS doc_id, d.lang AS lang, q.quality AS quality,
           |  CASE WHEN hv < $t1 THEN 'train'
           |       WHEN hv < $t2 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (
           |  SELECT doc_id, lang,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
           |      1, 8)) AS BIGINT) AS hv
           |  FROM documents) d
           |JOIN q ON q.doc_id = d.doc_id
           |JOIN rep ON rep.rep_id = d.doc_id
           |WHERE q.quality >= 0.25
           |  AND d.doc_id % $EvalModulus != 0
           |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val t1 = (0.90 * (1L << 32)).toLong
      val t2 = (0.95 * (1L << 32)).toLong
      val stop = "('the','a','of','and','is','to','in')"
      val quality = docs(s, dir)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ts"))
        .withColumn("quality",
          lit(0.3) * (expr(s"CAST(size(filter(ts, t -> t IN $stop)) AS BIGINT)")
            .cast("double") / size(col("ts"))) +
          lit(0.7) * (size(array_distinct(col("ts"))).cast("double") /
            size(col("ts"))))
      // stage 2: near-dup cluster keepers (memoized labels + rep window)
      val kept = quality
        .join(DedupOps.clusterReps(s, dir)
          .select(col("rep_id").as("doc_id")), Seq("doc_id"))
        .filter(col("quality") >= 0.25)
        .filter(col("doc_id") % EvalModulus =!= 0)
      val grams = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= ContamNgram)
        .select(col("doc_id"), explode(expr(
          s"""array_distinct(transform(sequence(1, size(ts)-${ContamNgram - 1}),
             |  i -> concat_ws(' ', slice(ts, i, $ContamNgram))))""".stripMargin))
          .as("ng"))
      // the memoized eval-gram table (shared with the decontaminate
      // gates) — one build per (session, dir), not one per stage plan
      val evalGrams = evalGramsOf(s, dir)
      val contaminated = grams.join(evalGrams, Seq("ng"))
        .select(col("doc_id")).distinct()
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 8),
        16, 10).cast("long")
      kept.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("quality"),
          when(hv < t1, "train").when(hv < t2, "val").otherwise("test")
            .as("split"))
        .orderBy(col("doc_id"))
    },

    // Corpus health report: the per-language dashboard a curation run
    // publishes — doc counts, token volume, exact-dup counts, mean
    // quality — in ONE tree (per-doc map-side stats → digest window →
    // one per-language rollup). Per-doc quality doubles are quantized
    // to integer micro-units (round(q·1e6), the mm_decode discipline —
    // a DECIMAL cast can land on a tie the two engines round apart)
    // before the exact integer sum; the language mean is then one
    // double division of identical operands.
    QuerySpec.sql(
      "analyze_corpus",
      """WITH perdoc AS (
        |  SELECT d.doc_id, d.lang, len(string_split(d.text, ' ')) AS n_toks,
        |    q.quality,
        |    CASE WHEN d.doc_id != MIN(d.doc_id) OVER
        |      (PARTITION BY md5(lower(d.text))) THEN 1 ELSE 0 END AS is_dup
        |  FROM documents d
        |  JOIN (
        |    SELECT doc_id,
        |      0.3 * (CAST(SUM(CASE WHEN tok IN
        |        ('the','a','of','and','is','to','in')
        |        THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))
        |      + 0.7 * (CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*))
        |        AS quality
        |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |          FROM documents)
        |    GROUP BY doc_id) q ON q.doc_id = d.doc_id)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |  CAST(SUM(is_dup) AS BIGINT) AS n_exact_dups,
        |  CAST(SUM(CAST(round(quality * 1e6) AS BIGINT)) AS DOUBLE)
        |    / (1e6 * COUNT(*)) AS mean_quality
        |FROM perdoc
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      val stop = "('the','a','of','and','is','to','in')"
      docs(s, dir)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ts"),
          md5(lower(col("text"))).as("fp"))
        .withColumn("quality",
          lit(0.3) * (expr(s"CAST(size(filter(ts, t -> t IN $stop)) AS BIGINT)")
            .cast("double") / size(col("ts"))) +
          lit(0.7) * (size(array_distinct(col("ts"))).cast("double") /
            size(col("ts"))))
        .withColumn("is_dup",
          when(col("doc_id") =!=
            min(col("doc_id")).over(Window.partitionBy(col("fp"))), 1L)
            .otherwise(0L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("ts")).cast("long")).as("total_tokens"),
          sum(col("is_dup")).as("n_exact_dups"),
          (sum(round(col("quality") * 1e6).cast("long")).cast("double") /
            (lit(1e6) * count(lit(1)))).as("mean_quality"))
        .orderBy(col("lang"))
    },

    // Deterministic dataset split: every document assigned to
    // train/val/test by integer hash thresholds (90/5/5) — the split
    // each training run must reproduce identically on any cluster, so
    // it is a pure function of the stable id (map-side predicate, no
    // shuffle, no RNG state; same construction as sample_stratified).
    QuerySpec.sql(
      "split_train_val_test", {
        val t1 = (0.90 * (1L << 32)).toLong // 3865470566
        val t2 = (0.95 * (1L << 32)).toLong // 4080218931
        s"""SELECT doc_id,
           |  CASE WHEN hv < $t1 THEN 'train'
           |       WHEN hv < $t2 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (
           |  SELECT doc_id,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
           |      1, 8)) AS BIGINT) AS hv
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val t1 = (0.90 * (1L << 32)).toLong
      val t2 = (0.95 * (1L << 32)).toLong
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 8),
        16, 10).cast("long")
      docs(s, dir)
        .select(col("doc_id"), hv.as("hv"))
        .select(col("doc_id"),
          when(col("hv") < t1, "train")
            .when(col("hv") < t2, "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },

    // Temperature sampling (α = 0.5): rebalance languages by sampling
    // quota_l ∝ n_l^α — the standard multilingual rebalancing that
    // up-weights low-resource languages. Exactness across engines:
    // α = 0.5 makes the scaling a SQRT, which IEEE requires correctly
    // rounded (unlike pow/ln), and the rounded value is immediately
    // floor-quantized to an integer, so quotas are pure integer
    // arithmetic — order-independent sums, exact division — in both
    // engines. Membership is then "the quota_l smallest salted hashes
    // per language": deterministic, partition-independent.
    //
    // Scale shape: quotas come from a 5-row aggregate (broadcast);
    // per-language selection is a TWO-LEVEL top-k — local row_number
    // within (lang, salt) buckets caps every sort task, then the
    // ≤ salts·K survivors per language rank in one tiny final window.
    // A single Window.partitionBy(lang) would sort an entire
    // language's corpus share in ONE task; the salted level bounds it.
    // (Correct because quota_l ≤ K: any global top-K row is top-K
    // within its salt bucket.)
    QuerySpec.sql(
      "sample_temperature",
      s"""WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         |scaled AS (
         |  SELECT lang, CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
         |    AS s
         |  FROM counts),
         |quotas AS (
         |  SELECT lang,
         |    CAST(($TempSampleK * s) // (SELECT CAST(SUM(s) AS BIGINT)
         |      FROM scaled) AS BIGINT) AS quota
         |  FROM scaled),
         |ranked AS (
         |  SELECT doc_id, lang,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
         |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':temp'),
         |        1, 8)) AS BIGINT), doc_id) AS rk
         |  FROM documents)
         |SELECT doc_id, lang, rk, quota
         |FROM ranked JOIN quotas USING (lang)
         |WHERE rk <= quota
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val hv = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":temp"))), 1, 8),
        16, 10).cast("long")
      val scaled = docs(s, dir)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .withColumn("s", floor(sqrt(col("n").cast("double")) * 1e6).cast("long"))
      val quotas = scaled
        .crossJoin(broadcast(scaled.agg(sum(col("s")).as("st"))))
        .select(col("lang"), expr(s"($TempSampleK * s) div st").as("quota"))
      val wLocal = Window.partitionBy(col("lang"),
          pmod(xxhash64(col("doc_id")), lit(TempSalts)))
        .orderBy(col("hv"), col("doc_id"))
      val wFinal = Window.partitionBy(col("lang"))
        .orderBy(col("hv"), col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), hv.as("hv"))
        .withColumn("lrk", row_number().over(wLocal))
        .filter(col("lrk") <= TempSampleK) // ≤ salts·K survivors per lang
        .withColumn("rk", row_number().over(wFinal))
        .join(broadcast(quotas), Seq("lang"))
        .filter(col("rk") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("rk"), col("quota"))
        .orderBy(col("doc_id"))
    },

    // Repetition quality signals (the Gopher-style "fraction of the
    // doc that is its most-repeated n-gram" family). Shuffle-free:
    // each doc's top-n-gram count is the longest run in its SORTED
    // n-gram array — one sort_array + one aggregate() fold per doc,
    // no explode and no (doc, gram) shuffle. The two-level
    // explode→groupBy plan computes the same number but shuffles every
    // n-gram occurrence; per-doc HOFs keep the whole signal map-side.
    QuerySpec.sql(
      "text_repetition",
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |g1 AS (SELECT doc_id, unnest(ts) AS g FROM toks),
        |c1 AS (SELECT doc_id, g, COUNT(*) AS c FROM g1 GROUP BY 1,2),
        |r1 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |         CAST(MAX(c) AS DOUBLE)/SUM(c) AS top_unigram_frac
        |       FROM c1 GROUP BY doc_id),
        |g2 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
        |       FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-1)) AS i) gi
        |       WHERE len(ts) >= 2),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1,2),
        |r2 AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE)/SUM(c) AS top_bigram_frac
        |       FROM c2 GROUP BY doc_id),
        |g3 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
        |       FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) gi
        |       WHERE len(ts) >= 3),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1,2),
        |r3 AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE)/SUM(c) AS top_trigram_frac
        |       FROM c3 GROUP BY doc_id)
        |SELECT r1.doc_id AS doc_id, n_tokens, top_unigram_frac,
        |  COALESCE(top_bigram_frac, 0.0) AS top_bigram_frac,
        |  COALESCE(top_trigram_frac, 0.0) AS top_trigram_frac
        |FROM r1 LEFT JOIN r2 ON r1.doc_id = r2.doc_id
        |        LEFT JOIN r3 ON r1.doc_id = r3.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // max n-gram multiplicity via the codegen'd
      // [[graft.functions.TopNgramCount]] expression — one O(L)
      // counting pass per width instead of materialize + sort_array +
      // interpreted fold (TopNgramSpec proves value equivalence to
      // that plan; the oracle keeps the explode+groupBy formulation).
      // Integer count / integer total keeps the double division
      // bit-identical across engines.
      import graft.functions.TopNgramCount.top_ngram_count
      val nTok = size(col("ts"))
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(
          col("doc_id"),
          nTok.cast("long").as("n_tokens"),
          (top_ngram_count(col("ts"), 1).cast("double") / nTok)
            .as("top_unigram_frac"),
          when(nTok < 2, lit(0.0))
            .otherwise(top_ngram_count(col("ts"), 2).cast("double") / (nTok - 1))
            .as("top_bigram_frac"),
          when(nTok < 3, lit(0.0))
            .otherwise(top_ngram_count(col("ts"), 3).cast("double") / (nTok - 2))
            .as("top_trigram_frac"))
        .orderBy(col("doc_id"))
    },

    // PII-style redaction: count + scrub emails and a domain-entity
    // token class, fingerprint the scrubbed text. Pure per-row regex —
    // map-side, no shuffle, and the same RE2-compatible patterns run
    // in both engines (no lookarounds/backrefs, so Java regex and
    // DuckDB's RE2 agree). The email pattern matches nothing in the
    // synthetic corpus (by design — the count proving that is part of
    // the check); the entity class exercises real replacements.
    QuerySpec.sql(
      "text_redact",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text,
        |    '\b(customer|order|value)\b')) AS BIGINT) AS n_entity,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b(customer|order|value)\b', '[ENTITY]', 'g')) AS redacted_fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val entityRe = "\\b(customer|order|value)\\b"
      docs(s, dir).select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
            .cast("long").as("n_email"),
          size(regexp_extract_all(col("text"), lit(entityRe), lit(0)))
            .cast("long").as("n_entity"),
          md5(regexp_replace(
            regexp_replace(col("text"), emailRe, "[EMAIL]"),
            entityRe, "[ENTITY]")).as("redacted_fp"))
        .orderBy(col("doc_id"))
    },

    // Ablation GRID — the planning table an ablation study reads
    // before spending any training compute: for each pipeline variant
    // (baseline / exact-dedup / quality-filter / both), the surviving
    // doc and token mass, from ONE corpus pass — per-doc keeper and
    // quality flags computed once (the dedup_exact keeper rule; the
    // eval gates' integer micro-score at the 0.5 threshold), then a
    // 4-row broadcast variant grid with CASE-selected membership.
    // Exact integer ppm of baseline per variant.
    QuerySpec.sql(
      "curate_ablation_grid",
      """WITH fp AS (
        |  SELECT doc_id, md5(lower(text)) AS fp,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    CAST((3 * len(list_filter(string_split(text, ' '),
        |        t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in')))
        |      + 7 * len(list_distinct(string_split(text, ' '))))
        |      * 1000000
        |      // (10 * len(string_split(text, ' '))) AS BIGINT)
        |      AS score
        |  FROM documents),
        |keep AS (SELECT fp, MIN(doc_id) AS kid FROM fp GROUP BY 1),
        |j AS (
        |  SELECT f.doc_id, f.nt,
        |    f.doc_id = k.kid AS is_keeper,
        |    f.score >= 500000 AS is_q
        |  FROM fp f JOIN keep k USING (fp)),
        |v AS (SELECT UNNEST(['baseline', 'dedup', 'quality',
        |    'dedup_quality']) AS variant),
        |g AS (
        |  SELECT v.variant,
        |    CAST(COALESCE(SUM(CASE WHEN
        |      CASE v.variant WHEN 'baseline' THEN TRUE
        |        WHEN 'dedup' THEN j.is_keeper
        |        WHEN 'quality' THEN j.is_q
        |        ELSE j.is_keeper AND j.is_q END
        |      THEN 1 END), 0) AS BIGINT) AS n_docs,
        |    CAST(COALESCE(SUM(CASE WHEN
        |      CASE v.variant WHEN 'baseline' THEN TRUE
        |        WHEN 'dedup' THEN j.is_keeper
        |        WHEN 'quality' THEN j.is_q
        |        ELSE j.is_keeper AND j.is_q END
        |      THEN j.nt END), 0) AS BIGINT) AS n_tokens
        |  FROM v CROSS JOIN j GROUP BY 1),
        |b AS (SELECT n_docs AS bd, n_tokens AS bt FROM g
        |  WHERE variant = 'baseline')
        |SELECT variant, n_docs, n_tokens,
        |  CAST(n_docs * 1000000 // bd AS BIGINT) AS docs_ppm,
        |  CAST(n_tokens * 1000000 // bt AS BIGINT) AS tokens_ppm
        |FROM g, b ORDER BY variant""".stripMargin) { (s, dir) =>
      import s.implicits._
      val fp = docs(s, dir).select(col("doc_id"),
        md5(lower(col("text"))).as("fp"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        expr("CAST((3 * size(filter(split(text, ' '), " +
          "t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) " +
          "+ 7 * size(array_distinct(split(text, ' ')))) * 1000000 " +
          "div (10 * size(split(text, ' '))) AS BIGINT)").as("score"))
      val keep = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("kid"))
      val j = fp.join(keep, Seq("fp"))
        .select(col("nt"),
          (col("doc_id") === col("kid")).as("is_keeper"),
          (col("score") >= 500000L).as("is_q"))
      val member = expr("CASE variant WHEN 'baseline' THEN TRUE " +
        "WHEN 'dedup' THEN is_keeper WHEN 'quality' THEN is_q " +
        "ELSE is_keeper AND is_q END")
      val g = j.crossJoin(broadcast(Seq("baseline", "dedup",
          "quality", "dedup_quality").toDF("variant")))
        .groupBy(col("variant"))
        .agg(coalesce(sum(when(member, 1L)), lit(0L)).as("n_docs"),
          coalesce(sum(when(member, col("nt"))), lit(0L))
            .as("n_tokens"))
      val b = g.filter(col("variant") === "baseline")
        .select(col("n_docs").as("bd"), col("n_tokens").as("bt"))
      g.crossJoin(broadcast(b))
        .select(col("variant"), col("n_docs"), col("n_tokens"),
          expr("CAST(n_docs * 1000000 div bd AS BIGINT)")
            .as("docs_ppm"),
          expr("CAST(n_tokens * 1000000 div bt AS BIGINT)")
            .as("tokens_ppm"))
        .orderBy(col("variant"))
    },

    // Inverse-propensity REWEIGHTING summary — the alternative to
    // mix_domains' resampling: keep every document once, weight each
    // by target-share/actual-share (exact micro-weights, capped ×32
    // like the mix's repeat factor), and report the variance price as
    // Kish's effective sample size ESS = (Σw)²/Σw². All sums run on
    // the |sources|-row aggregate; the wide products go through
    // HUGEINT/DECIMAL(38,0) (exact 128-bit in both engines, integer
    // truncating division on positives), so the classically-float ESS
    // is an exact integer. One fact pass for the per-source token
    // sums; everything after is aggregate-grain.
    QuerySpec.sql(
      "curate_ipw_ess",
      """WITH st AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS s_toks
        |  FROM documents GROUP BY 1),
        |tgt AS (
        |  SELECT CAST(SUM(s_toks) // COUNT(*) AS BIGINT) AS t_toks,
        |    CAST(SUM(n_docs) AS BIGINT) AS n_total,
        |    CAST(COUNT(*) AS BIGINT) AS n_sources
        |  FROM st),
        |w AS (
        |  SELECT source, n_docs,
        |    LEAST(32000000, CAST(t_toks * 1000000 // s_toks AS BIGINT))
        |      AS w_micro
        |  FROM st CROSS JOIN tgt),
        |a AS (
        |  SELECT CAST(SUM(n_docs * w_micro) AS BIGINT) AS sw,
        |    SUM(CAST(n_docs AS HUGEINT) * w_micro * w_micro) AS sw2
        |  FROM w)
        |SELECT t.n_sources, t.n_total AS n_docs, a.sw AS sum_w_micro,
        |  CAST(CAST(a.sw AS HUGEINT) * a.sw // a.sw2 AS BIGINT)
        |    AS ess_docs,
        |  CAST(CAST(CAST(a.sw AS HUGEINT) * a.sw // a.sw2 AS BIGINT)
        |    * 1000000 // t.n_total AS BIGINT) AS ess_ppm
        |FROM a, tgt t""".stripMargin) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val st = docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("s_toks"))
      val tgt = st.agg(expr("sum(s_toks) div count(1)").as("t_toks"),
        sum(col("n_docs")).as("n_total"),
        count(lit(1)).as("n_sources"))
      val w = st.crossJoin(broadcast(tgt))
        .select(col("n_docs"), col("n_total"), col("n_sources"),
          least(lit(32000000L),
            expr("t_toks * 1000000 div s_toks")).as("w_micro"))
      w.groupBy(col("n_total"), col("n_sources"))
        .agg(sum(col("n_docs") * col("w_micro")).cast("long").as("sw"),
          sum(col("n_docs").cast(d38) * col("w_micro").cast(d38) *
            col("w_micro").cast(d38)).as("sw2"))
        .select(col("n_sources"), col("n_total").as("n_docs"),
          col("sw").as("sum_w_micro"),
          expr("CAST(CAST(sw AS DECIMAL(38,0)) * sw div sw2 AS BIGINT)")
            .as("ess_docs"),
          expr("CAST(CAST(CAST(sw AS DECIMAL(38,0)) * sw div sw2 " +
            "AS BIGINT) * 1000000 div n_total AS BIGINT)").as("ess_ppm"))
    })
}
