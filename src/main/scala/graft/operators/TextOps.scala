package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Materialize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (language-ID heuristic, quality
  * scoring, token counting, fingerprinting) required beyond the
  * reference's own operators.
  *
  * All token-level work is expressed as explode + hash-aggregate so it
  * scales horizontally: no per-document UDF state, everything stays in
  * whole-stage codegen, and the shuffle key is doc_id (uniform — no
  * skew).
  */
object TextOps {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Word-frequency dictionary for the BPE trainer: lowercase alpha
    * words (length ≥ 2, the text_bpe_pairs tokenization) with corpus
    * frequencies. DICTIONARY-FIRST like every trainer since Sennrich
    * 2016: all merge rounds run over distinct words weighted by freq —
    * vocabulary-bounded work however large the corpus.
    */
  private[graft] def bpeWordDict(docsDf: DataFrame): DataFrame =
    docsDf
      .select(explode(expr(
        "filter(regexp_extract_all(lower(text), '[a-z]+', 0), t -> length(t) >= 2)"))
        .as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Distributed BPE training (Sennrich et al. 2016), `rounds` merges:
    * each round counts adjacent-symbol pairs over the weighted word
    * dictionary (one map-side-combinable hash aggregate), takes the
    * deterministic argmax (count DESC, pair ASC — ONE driver row per
    * round, the k-center discipline), and rewrites every word's symbol
    * array with a greedy left-to-right non-overlapping merge fold (a
    * per-row HOF — no shuffle). The per-round plan is re-materialized
    * ([[graft.functions.Materialize.stable]]) so lineage never grows
    * with the round count. Returns (merge table, final dictionary).
    *
    * Not SQL-expressible in one query (the merge chosen in round r
    * rewrites the input of round r+1), so this is unit-proven against
    * a sequential reference (BpeTrainSpec) and registered rows-only.
    */
  private[graft] def bpeTrain(s: SparkSession, dict0: DataFrame,
      rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    // split(word, '') leaves a trailing '' under Spark's limit=-1
    // regex-split semantics — filter it or every word ends in a
    // phantom pair (c, '')
    var dict = dict0
      .withColumn("syms", expr("filter(split(word, ''), x -> x <> '')"))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = dict
        .select(col("freq"), explode(expr(
          "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1), (a, b) -> struct(a, b))"))
          .as("p"))
        .groupBy(col("p.a").as("l"), col("p.b").as("rt"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("rt"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, rt, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, l, rt, cnt))
        // greedy left-to-right non-overlap: the fold merges the pair
        // iff the accumulator's LAST symbol is the (un-merged) left
        // part — "aaaa" under (a,a) becomes [aa, aa], never [aa, a, a]
        dict = graft.functions.Materialize.stable(
          dict.withColumn("syms", expr(
            s"""aggregate(syms, CAST(array() AS ARRAY<STRING>),
               |  (acc, s) -> CASE
               |    WHEN size(acc) > 0 AND element_at(acc, -1) = '$l'
               |      AND s = '$rt'
               |    THEN concat(slice(acc, 1, size(acc) - 1), array('$l$rt'))
               |    ELSE concat(acc, array(s)) END)""".stripMargin)))
        r += 1
      }
    }
    (merges.toSeq, dict)
  }

  /** DuckDB oracle for [[bpeTrain]], `rounds` merge rounds unrolled as
    * chained MATERIALIZED CTEs. Each round r: `p{r}` is the argmax
    * pair over dict `d{r-1}` (count DESC, pair ASC — the trainer's
    * tiebreak), `d{r}` rewrites every word with the boundary-wrapped
    * replace (see the gate comment for why replace ≡ the greedy fold).
    * Symbols are [a-z]+ substrings so '|' can never occur inside one.
    */
  private[graft] def bpeOracleSql(rounds: Int): String =
    s"""WITH ${bpeChainCtes(rounds, finalDict = false)}
       |SELECT * FROM (
       |  ${(1 to rounds).map { r =>
            s"""SELECT $r AS "rank", l AS "left", r AS "right",
               |    l || r AS merged, cnt FROM p$r""".stripMargin
          }.mkString("\n  UNION ALL ")})
       |ORDER BY "rank"""".stripMargin

  /** The unrolled training chain as CTE text: `words` (weighted word
    * dictionary), `d0` (char symbolization), then per round `p{r}`
    * (argmax pair) and — when a later round or `finalDict` needs it —
    * `d{r}` (the rewrite). `word` is carried through every dict so a
    * consumer (the APPLY oracle) can join the trained segmentation
    * back to the corpus.
    */
  private def bpeChainCtes(rounds: Int, finalDict: Boolean): String = {
    val pairs = (s: String) =>
      s"""SELECT p[1] AS l, p[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
         |    FROM (SELECT freq, unnest(list_transform(
         |        generate_series(1, len(syms) - 1),
         |        i -> [syms[i], syms[i + 1]])) AS p
         |      FROM (SELECT freq, string_split(trim(enc, '|'), '||') AS syms
         |            FROM $s))
         |    GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1""".stripMargin
    val roundsSql = (1 to rounds).map { r =>
      val rewrite =
        s"""d$r AS MATERIALIZED (
           |  SELECT word, freq,
           |    replace(enc, '|' || p$r.l || '||' || p$r.r || '|',
           |      '|' || p$r.l || p$r.r || '|') AS enc
           |  FROM d${r - 1}, p$r)""".stripMargin
      val pick = s"""p$r AS MATERIALIZED (
           |  ${pairs(s"d${r - 1}")})""".stripMargin
      if (r < rounds || finalDict) s"$pick,\n$rewrite" else pick
    }.mkString(",\n")
    s"""words AS MATERIALIZED (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(list_filter(
       |      regexp_extract_all(lower(text), '[a-z]+'),
       |      t -> length(t) >= 2)) AS w FROM documents)
       |  GROUP BY 1),
       |d0 AS MATERIALIZED (
       |  SELECT word, freq, '|' || array_to_string(
       |    list_transform(generate_series(1, length(word)),
       |      i -> substr(word, i, 1)), '||') || '|' AS enc
       |  FROM words),
       |$roundsSql""".stripMargin
  }

  /** Oracle for the APPLY gate: run the same unrolled training chain
    * to the final dictionary `d{rounds}`, derive each word's trained
    * token count, and join it back to every word occurrence in the
    * corpus — per-document token statistics under the trained
    * tokenizer, all exact integers.
    */
  private[graft] def bpeApplyOracleSql(rounds: Int): String =
    s"""WITH ${bpeChainCtes(rounds, finalDict = true)},
       |wsym AS (
       |  SELECT word,
       |    CAST(len(string_split(trim(enc, '|'), '||')) AS BIGINT)
       |      AS n_syms,
       |    CAST(length(word) AS BIGINT) AS n_chars
       |  FROM d$rounds),
       |tok AS (
       |  SELECT doc_id, unnest(list_filter(
       |      regexp_extract_all(lower(text), '[a-z]+'),
       |      t -> length(t) >= 2)) AS word
       |  FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(n_syms) AS BIGINT) AS n_tokens,
       |  CAST((SUM(n_syms) * 1000000) // SUM(n_chars) AS BIGINT)
       |    AS tokens_per_char_ppm
       |FROM tok JOIN wsym USING (word)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Count-min sketch geometry: d hash rows × w counters — 1 024 longs
    * of total state regardless of vocabulary size. Row i's hash is the
    * first 13 hex chars (52 bits) of md5(i ':' token) mod w, the same
    * engine-portable digest family every sketch gate uses. The oracle
    * SQL is generated from the same constants.
    */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Stopword markers per language for the n-gram/stopword language-ID
    * heuristic. Deterministic, mirrored verbatim in the oracle SQL.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "im"),
    "es" -> Seq("el", "los", "de", "y", "un", "es", "en"),
    "zh" -> Seq("de", "shi", "le", "bu", "zai", "wo", "you"))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** The language-ID prediction as PURE INTEGER comparisons over the
    * per-language stopword hit counts h_<lang> — provably the same
    * prediction as text_lang_id's score chain (all scores share the
    * per-doc denominator, so h_l/n >= h_r/n ⟺ h_l >= h_r), shared
    * VERBATIM between the Spark plan and the oracle of the
    * confusion/PRF gates.
    */
  private val langPredCase: String = {
    val langs = langMarkers.map(_._1)
    val chain = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      s"WHEN h_$l > 0 AND ${rest.map(r => s"h_$l >= h_$r").mkString(" AND ")} THEN '$l'"
    }.mkString(" ") + s" WHEN h_${langs.last} > 0 THEN '${langs.last}'"
    s"CASE $chain ELSE 'unknown' END"
  }

  /** DuckDB subquery: per-doc (doc_id, lang, h_<lang> hit counts). */
  private val langHitsSql: String = {
    val hitCols = langMarkers.map { case (l, ws) =>
      s"""      CAST(SUM(CASE WHEN tok IN ${inList(ws)} THEN 1 ELSE 0 END)
         |        AS BIGINT) AS h_$l""".stripMargin
    }.mkString(",\n")
    s"""SELECT doc_id, lang,
       |$hitCols
       |    FROM (SELECT doc_id, lang, unnest(string_split(text, ' '))
       |        AS tok FROM documents)
       |    GROUP BY doc_id, lang""".stripMargin
  }

  /** DuckDB CTE `cm` = (true_lang, pred_lang) per document. */
  private val langCmCte: String =
    s"""cm AS (
       |  SELECT lang AS true_lang, $langPredCase AS pred_lang
       |  FROM (
       |    $langHitsSql))""".stripMargin

  /** Spark side of [[langCmCte]]: shuffle-free per-doc hit counts
    * (array filters) + the same integer prediction chain.
    */
  private def langCm(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang").as("true_lang") +:
        split(col("text"), " ").as("ts") +: Nil: _*)
      .select(col("true_lang") +: langMarkers.map { case (l, ws) =>
        expr(s"CAST(size(filter(ts, t -> t IN ${inList(ws)})) AS BIGINT)")
          .as(s"h_$l")
      }: _*)
      .withColumn("pred_lang", expr(langPredCase))
      .select(col("true_lang"), col("pred_lang"))

  /** Winnow fingerprint parameters shared by the text_winnow gate and
    * the dedup_winnow_pairs posting-list join (k-char shingles, window
    * of w shingle hashes).
    */
  private[operators] val (winnowK, winnowW) = (8, 4)

  /** Per-document winnow fingerprints (doc_id, fp: array<string>),
    * cached: CacheManager keys on the analyzed plan, so the winnow
    * gate and the pair-generation gate share one fingerprint pass per
    * (dir) — at warehouse scale this is the materialized fingerprint
    * table every substring-dedup consumer reads.
    */
  private[operators] def winnowFps(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(length(col("text")) >= winnowK + winnowW - 1)
      .select(col("doc_id"),
        graft.functions.WinnowFp.winnow_fp(col("text"), winnowK, winnowW)
          .as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Unpersist this object's plan-keyed caches for (s, dir). Last
    * consumer is DedupOps (dedup_winnow_pairs) — callers must not
    * release before that section has run.
    */
  /** One trained BPE model per (session, dir), shared by the train
    * and apply gates — the trainer's 5 driver-coordinated rounds run
    * once; the dict's per-round localCheckpoints already bound its
    * lineage. At warehouse scale this is the published tokenizer
    * artifact every apply job reads.
    */
  private val bpeModelMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String),
      (Seq[(Int, String, String, Long)], DataFrame)]

  private def bpeModel(s: SparkSession, dir: String)
      : (Seq[(Int, String, String, Long)], DataFrame) =
    bpeModelMemo.synchronized {
      bpeModelMemo.getOrElseUpdate((s, dir),
        bpeTrain(s, bpeWordDict(docs(s, dir)), 5))
    }

  private[graft] def releaseCaches(s: SparkSession, dir: String): Unit = {
    winnowFps(s, dir).unpersist(blocking = true)
    bpeModelMemo.synchronized {
      bpeModelMemo.keys.filter(_._1 eq s)
        .foreach(k => bpeModelMemo.remove(k)
          .foreach(_._2.unpersist(blocking = false)))
    }
  }

  def specs: Seq[QuerySpec] = Seq(
    // Boilerplate-line detection — the CCNet-style per-SOURCE cleanup
    // dedup_lines does NOT do: dedup keeps a line's first occurrence
    // corpus-wide, while boilerplate removal drops every instance of
    // a line that recurs across ≥ 5% of ITS source's documents
    // (nav bars, footers, cookie banners — template text, not
    // content). 2-word segments min 8 chars (the corpus vocabulary is
    // compressed, so longer exact segments are near-unique — the
    // segment width is the knob a real deployment retunes); line
    // doc-frequency joins against per-source doc counts (both
    // aggregate-grain), and the per-source report carries the exact
    // ppm of line instances a cleanup pass would remove. Shuffle keys
    // are (source, line-key) — bucket-friendly at any corpus size.
    QuerySpec.sql(
      "text_boilerplate_lines", {
        val lw = 2
        val ml = 8
        s"""WITH segs AS (
           |  SELECT doc_id, source, lower(trim(array_to_string(
           |      ws[u.g * $lw + 1 : u.g * $lw + $lw], ' '))) AS k
           |  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
           |        FROM documents) d,
           |    UNNEST(generate_series(0,
           |      CAST(FLOOR((len(ws) - 1) / $lw) AS BIGINT))) AS u(g)),
           |f AS (SELECT doc_id, source, k FROM segs
           |  WHERE length(k) >= $ml),
           |dl AS (SELECT DISTINCT doc_id, source, k FROM f),
           |nd AS (SELECT source,
           |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
           |  FROM documents GROUP BY 1),
           |dfc AS (SELECT source, k, CAST(COUNT(*) AS BIGINT) AS df
           |  FROM dl GROUP BY 1, 2),
           |bp AS (SELECT dfc.source, dfc.k
           |  FROM dfc JOIN nd USING (source)
           |  WHERE dfc.df >= 2 AND dfc.df * 20 >= nd.n_docs),
           |lstats AS (
           |  SELECT dfc.source,
           |    CAST(COUNT(*) AS BIGINT) AS n_distinct_lines,
           |    CAST(COALESCE(SUM(CASE WHEN dfc.df >= 2
           |      AND dfc.df * 20 >= nd.n_docs THEN 1 END), 0) AS BIGINT)
           |      AS n_boilerplate_lines
           |  FROM dfc JOIN nd USING (source) GROUP BY 1),
           |inst AS (
           |  SELECT f.source,
           |    CAST(COUNT(*) AS BIGINT) AS n_line_instances,
           |    CAST(COALESCE(SUM(CASE WHEN bp.k IS NOT NULL THEN 1 END),
           |      0) AS BIGINT) AS boilerplate_instances,
           |    CAST(COUNT(DISTINCT CASE WHEN bp.k IS NOT NULL
           |      THEN f.doc_id END) AS BIGINT) AS docs_affected
           |  FROM f LEFT JOIN bp ON bp.source = f.source AND bp.k = f.k
           |  GROUP BY 1)
           |SELECT l.source, n_distinct_lines, n_boilerplate_lines,
           |  n_line_instances, boilerplate_instances, docs_affected,
           |  CAST(boilerplate_instances * 1000000 // n_line_instances
           |    AS BIGINT) AS boilerplate_ppm
           |FROM lstats l JOIN inst USING (source)
           |ORDER BY source""".stripMargin
      }) { (s, dir) =>
      val lw = 2
      val ml = 8
      val f = docs(s, dir).select(col("doc_id"), col("source"),
          explode(expr(
            s"""transform(
               |  sequence(0, (size(split(text, ' ')) - 1) div $lw),
               |  g -> lower(trim(concat_ws(' ',
               |    slice(split(text, ' '), g * $lw + 1, $lw)))))"""
              .stripMargin)).as("k"))
        .filter(length(col("k")) >= ml)
      val nd = docs(s, dir).groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      // ONE pass over the exploded segment surface: fold to
      // (doc, key) grain immediately (instance count rides along),
      // materialize, and every later step runs on aggregate grain —
      // the raw segments are never re-exploded.
      val perDoc = graft.functions.Materialize.stable(
        f.groupBy(col("doc_id"), col("source"), col("k"))
          .agg(count(lit(1)).as("c")))
      val dfc = perDoc.groupBy(col("source"), col("k"))
        .agg(count(lit(1)).as("df"))
      val withNd = dfc.join(broadcast(nd), Seq("source"))
      val bp = withNd
        .filter(col("df") >= 2 && col("df") * 20 >= col("n_docs"))
        .select(col("source"), col("k"), lit(1).as("is_bp"))
      val lstats = withNd.groupBy(col("source"))
        .agg(count(lit(1)).as("n_distinct_lines"),
          coalesce(sum(when(col("df") >= 2 &&
            col("df") * 20 >= col("n_docs"), 1L)), lit(0L))
            .as("n_boilerplate_lines"))
      val inst = perDoc.join(bp, Seq("source", "k"), "left")
        .groupBy(col("source"))
        .agg(sum(col("c")).cast("long").as("n_line_instances"),
          coalesce(sum(when(col("is_bp") === 1, col("c"))), lit(0L))
            .cast("long").as("boilerplate_instances"),
          countDistinct(when(col("is_bp") === 1, col("doc_id")))
            .as("docs_affected"))
      lstats.join(inst, Seq("source"))
        .select(col("source"), col("n_distinct_lines"),
          col("n_boilerplate_lines"), col("n_line_instances"),
          col("boilerplate_instances"), col("docs_affected"),
          expr("CAST(boilerplate_instances * 1000000 div " +
            "n_line_instances AS BIGINT)").as("boilerplate_ppm"))
        .orderBy(col("source"))
    },

    // Token counting: whitespace tokenization + char stats per document.
    QuerySpec.sql(
      "text_token_stats",
      """SELECT doc_id, length(text) AS n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          size(split(col("text"), " ")).as("n_tokens"))
        .withColumn("avg_token_len",
          (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    // (letter runs / digit runs / punctuation runs) instead of plain
    // whitespace splitting, with per-class counts. Both engines use
    // the same pattern; classification is first-char range compares
    // (no per-token regex) so the whole thing stays codegen-friendly.
    QuerySpec.sql(
      "text_token_bpe",
      """SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(toks, t ->
        |    (t[1] BETWEEN 'A' AND 'Z') OR (t[1] BETWEEN 'a' AND 'z')))
        |    AS BIGINT) AS n_alpha,
        |  CAST(len(list_filter(toks, t -> t[1] BETWEEN '0' AND '9'))
        |    AS BIGINT) AS n_digit,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
        |    AS n_token_chars,
        |  CASE WHEN len(toks) = 0 THEN 0.0
        |    ELSE CAST(list_sum(list_transform(toks, t -> length(t)))
        |      AS DOUBLE) / len(toks) END AS avg_token_chars
        |FROM (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')
        |      AS toks
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))
      docs(s, dir)
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          expr("""CAST(size(filter(toks, t ->
            |  (substring(t, 1, 1) >= 'A' AND substring(t, 1, 1) <= 'Z') OR
            |  (substring(t, 1, 1) >= 'a' AND substring(t, 1, 1) <= 'z')))
            |AS BIGINT)""".stripMargin).as("n_alpha"),
          expr("""CAST(size(filter(toks, t ->
            |  substring(t, 1, 1) >= '0' AND substring(t, 1, 1) <= '9'))
            |AS BIGINT)""".stripMargin).as("n_digit"),
          expr("""aggregate(toks, CAST(0 AS BIGINT),
            |  (a, t) -> a + length(t))""".stripMargin).as("n_token_chars"))
        .withColumn("avg_token_chars",
          when(col("n_tokens") === 0L, lit(0.0))
            .otherwise(col("n_token_chars").cast("double") / col("n_tokens")))
        .orderBy(col("doc_id"))
    },

    // BPE vocabulary induction, step one: the corpus-wide adjacent
    // symbol-pair statistics the first merge is chosen from (Sennrich
    // et al. 2016). Symbols start as characters, so this counts every
    // within-word character bigram occurrence over lowercase alpha
    // words and keeps the top 50 merge candidates — the exact table a
    // BPE trainer's first iteration maximizes over. The per-round
    // re-count after each merge is this same query over re-segmented
    // words (driver loop, one merge per round at any scale).
    //
    // Scale shape: pair extraction is a per-doc flatMap (HOF, no
    // shuffle); the count is ONE map-side-combinable hash aggregate
    // over ≤ 26² distinct keys; the global top-k is
    // TakeOrderedAndProject over those ≤ 676 rows — no sort of
    // row-scale data anywhere.
    // HTML main-content extraction — the FIRST pass of every web
    // corpus pipeline (the trafilatura/jusText job): each document is
    // wrapped in a deterministic page template (head/title/script,
    // nav, footer) and the extractor must get the article text back
    // out — structural elements dropped whole (non-greedy element
    // kills for head/nav/footer), residual tags stripped, title captured
    // from its element. The patterns stay in the Java-regex ∩ RE2
    // common subset (no lookaround), so both engines run the same
    // chain; `extract_exact` self-checks that the recovered text is
    // byte-identical to the original — the extraction really is the
    // inverse of the templating. Pure per-row regex work: no shuffle
    // before the output sort, codegen'd end to end.
    QuerySpec.sql(
      "text_html_extract",
      """WITH raw AS (
        |  SELECT doc_id, text,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        |      || '</title><script>var a=1;</script></head><body>'
        |      || '<nav>home | about | contact</nav><p>' || text
        |      || '</p><footer>(c) corp</footer></body></html>' AS page
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, text, page,
        |    regexp_extract(page, '<title>([^<]*)</title>', 1) AS title,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      page,
        |      '<head>.*?</head>', '', 'g'),
        |      '<nav>.*?</nav>', '', 'g'),
        |      '<footer>.*?</footer>', '', 'g'),
        |      '<[^>]*>', '', 'g') AS clean
        |  FROM raw)
        |SELECT doc_id, title,
        |  CAST(length(page) AS BIGINT) AS n_raw_chars,
        |  CAST(length(clean) AS BIGINT) AS n_clean_chars,
        |  CAST((length(page) - length(clean)) * 1000000
        |    // length(page) AS BIGINT) AS boilerplate_ppm,
        |  md5(clean) AS clean_md5,
        |  CAST(md5(clean) = md5(text) AS BOOLEAN) AS extract_exact
        |FROM x
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val page = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><script>var a=1;</script></head><body>"),
        lit("<nav>home | about | contact</nav><p>"), col("text"),
        lit("</p><footer>(c) corp</footer></body></html>"))
      docs(s, dir)
        .select(col("doc_id"), col("text"), page.as("page"))
        .withColumn("title",
          regexp_extract(col("page"), "<title>([^<]*)</title>", 1))
        .withColumn("clean",
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            col("page"),
            "<head>.*?</head>", ""),
            "<nav>.*?</nav>", ""),
            "<footer>.*?</footer>", ""),
            "<[^>]*>", ""))
        .select(col("doc_id"), col("title"),
          length(col("page")).cast("long").as("n_raw_chars"),
          length(col("clean")).cast("long").as("n_clean_chars"),
          expr("((length(page) - length(clean)) * 1000000) div length(page)")
            .as("boilerplate_ppm"),
          md5(col("clean")).as("clean_md5"),
          (md5(col("clean")) === md5(col("text"))).as("extract_exact"))
        .orderBy(col("doc_id"))
    },

    // BM25 retrieval ranking (Robertson/Lucene BM25, k1=1.2 b=0.75) —
    // the scoring a RAG-training pipeline runs against its corpus
    // index. EXACT ARITHMETIC: with k1=6/5 and b=3/4 the term score
    // algebraically reduces to one integer division,
    //   (idf_micros * 22 * tf * total_tokens)
    //     div (10*tf*total + 3*total + 9*dl*n_docs),
    // so only the idf's ln() is floating point — and it is micro-
    // rounded through the IDENTICAL expression text in both engines
    // (the text_lm_score discipline). Non-negative Lucene idf
    // ln(1 + (N-df+0.5)/(df+0.5)). Scale shape: query-term filter
    // BEFORE any aggregation (the postings a real index would seek),
    // two keyed aggregates, one broadcast scalar, TakeOrdered top-10.
    // At warehouse scale the integer cross-products ride DECIMAL(38,0);
    // at gate scale BIGINT holds them with 3 digits to spare.
    QuerySpec.sql(
      "text_bm25_topk",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        |  FROM toks GROUP BY 1),
        |scal AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
        |  CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
        |tfq AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks WHERE tok IN ('hash', 'join', 'spark')
        |  GROUP BY 1, 2),
        |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM tfq GROUP BY 1),
        |sc AS (
        |  SELECT tfq.doc_id,
        |    (CAST(round(ln(1 + (nd - df + 0.5) / (df + 0.5)) * 1e6)
        |        AS BIGINT) * 22 * tf * tt)
        |      // (10 * tf * tt + 3 * tt + 9 * dl * nd) AS s
        |  FROM tfq JOIN dfq USING (tok) JOIN dl USING (doc_id)
        |  CROSS JOIN scal)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
        |  CAST(SUM(s) AS BIGINT) AS score_micros
        |FROM sc GROUP BY doc_id
        |ORDER BY score_micros DESC, doc_id LIMIT 10""".stripMargin) {
      (s, dir) =>
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val dl = toks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dl"))
      val scal = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tt"))
      val tfq = toks.filter(col("tok").isin("hash", "join", "spark"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfq = tfq.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      tfq.join(broadcast(dfq), Seq("tok"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(scal))
        .select(col("doc_id"),
          expr("""(CAST(round(ln(1 + (nd - df + 0.5) / (df + 0.5)) * 1e6)
                 |    AS BIGINT) * 22 * tf * tt)
                 |  div (10 * tf * tt + 3 * tt + 9 * dl * nd)""".stripMargin)
            .as("s"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hit_terms"),
          sum(col("s")).cast("long").as("score_micros"))
        .orderBy(col("score_micros").desc, col("doc_id"))
        .limit(10)
    },

    QuerySpec.sql(
      "text_bpe_pairs",
      """SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(flatten(list_transform(
        |      list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        |        t -> length(t) >= 2),
        |      t -> list_transform(generate_series(1, length(t) - 1),
        |        i -> substr(t, i, 2))))) AS pair
        |  FROM documents) u
        |GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(explode(expr(
          """flatten(transform(
            |  filter(regexp_extract_all(lower(text), '[a-z]+', 0),
            |    t -> length(t) >= 2),
            |  t -> transform(sequence(1, length(t) - 1),
            |    i -> substring(t, i, 2))))""".stripMargin)).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(50)
    },

    // BPE TRAINING, five merge rounds over the weighted word
    // dictionary (see [[bpeTrain]]) — the step text_bpe_pairs is the
    // first iteration of, run to a learned merge list. Iterative
    // (round r's merge rewrites round r+1's input), so the oracle
    // UNROLLS the five rounds as chained MATERIALIZED CTEs, the same
    // discipline as the LTTB / pagerank / Hilbert oracles. The fold's
    // greedy left-to-right non-overlapping merge is expressed in SQL
    // via a boundary-wrapped encoding: a word's symbol list [s1..sn]
    // is the string '|s1||s2||…||sn|', under which merging pair (l,r)
    // is EXACTLY replace(enc, '|l||r|', '|lr|') — SQL replace scans
    // left-to-right and never rescans a replacement, the fold's
    // semantics (BpeTrainSpec pins the Spark side against a
    // sequential reference trainer; this equivalence is property-
    // tested there too).
    QuerySpec.sql("text_bpe_train", bpeOracleSql(5)) { (s, dir) =>
      val (merges, _) = bpeModel(s, dir)
      import s.implicits._
      merges.toDF("rank", "left", "right", "cnt")
        .select(col("rank"), col("left"), col("right"),
          concat(col("left"), col("right")).as("merged"), col("cnt"))
        .orderBy(col("rank"))
    },

    // BPE APPLY — tokenize the corpus with the TRAINED tokenizer (the
    // single most-run op in a training-data pipeline): the trained
    // dictionary maps each word to its merged symbol count, and every
    // word occurrence joins against it — per-document token counts,
    // char counts, and the tokens-per-char compression ratio in exact
    // ppm. Scale shape: the dictionary is the vocabulary (not the
    // corpus), the join key is the word (uniform-ish after the
    // freq-weighted head, and AQE broadcasts the dict when it fits),
    // and everything else is per-doc flatMap + one keyed aggregate.
    QuerySpec.sql("text_bpe_apply", bpeApplyOracleSql(5)) { (s, dir) =>
      val (_, dict) = bpeModel(s, dir)
      val wsym = dict.select(col("word"),
        size(col("syms")).cast("long").as("n_syms"),
        length(col("word")).cast("long").as("n_chars"))
      docs(s, dir)
        .select(col("doc_id"), explode(expr(
          """filter(regexp_extract_all(lower(text), '[a-z]+', 0),
            |  t -> length(t) >= 2)""".stripMargin)).as("word"))
        .join(wsym, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_chars")).cast("long").as("n_chars"),
          sum(col("n_syms")).cast("long").as("n_tokens"))
        .withColumn("tokens_per_char_ppm",
          expr("(n_tokens * 1000000) div n_chars"))
        .orderBy(col("doc_id"))
    },

    // RAKE keyphrase extraction (Rose et al. 2010) — the stopword-
    // delimited complement to TextRank: candidate phrases are maximal
    // stopword-free runs, a word scores deg/freq (degree = summed
    // length of phrases containing it — co-occurrence favors words
    // that live in long phrases), a phrase scores the sum of its word
    // scores. Phrase segmentation is ONE keyed prefix-count window
    // (stopwords seen so far = phrase id); scores are integer ppm
    // (floor per word, then exact sums) so the classically-float
    // ranking hash-compares; identical phrase strings dedup to one
    // candidate with an occurrence count. Corpus-wide top-20.
    QuerySpec.sql(
      "text_keyphrase_rake",
      """WITH toks AS (
        |  SELECT doc_id, i, ws[i] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents) d,
        |    LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t),
        |m AS (
        |  SELECT doc_id, i, tok,
        |    CASE WHEN tok IN ('the','a','of','and','is','to','in')
        |      THEN 1 ELSE 0 END AS st
        |  FROM toks),
        |g AS (
        |  SELECT doc_id, i, tok, st,
        |    SUM(st) OVER (PARTITION BY doc_id ORDER BY i) AS grp
        |  FROM m),
        |pt AS (SELECT doc_id, grp, i, tok FROM g WHERE st = 0),
        |pl AS (SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS plen
        |  FROM pt GROUP BY 1, 2),
        |wsc AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(plen) AS BIGINT) AS deg
        |  FROM pt JOIN pl USING (doc_id, grp) GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, grp,
        |    CAST(SUM((deg * 1000000) // freq) AS BIGINT) AS score_ppm,
        |    string_agg(tok, ' ' ORDER BY i) AS phrase
        |  FROM pt JOIN wsc USING (tok) GROUP BY 1, 2)
        |SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  CAST(MAX(score_ppm) AS BIGINT) AS score_ppm
        |FROM sc GROUP BY 1
        |ORDER BY score_ppm DESC, phrase LIMIT 20""".stripMargin) {
      (s, dir) =>
      val toks = docs(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("i0", "tok")))
        .select(col("doc_id"), (col("i0") + 1).as("i"), col("tok"))
      val m = toks.withColumn("st",
        when(col("tok").isin("the", "a", "of", "and", "is", "to", "in"),
          1L).otherwise(0L))
      val wGrp = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val pt = m.withColumn("grp", sum(col("st")).over(wGrp))
        .filter(col("st") === 0)
        .select(col("doc_id"), col("grp"), col("i"), col("tok"))
      val pl = pt.groupBy(col("doc_id"), col("grp"))
        .agg(count(lit(1)).as("plen"))
      val wsc = pt.join(pl, Seq("doc_id", "grp"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"),
          sum(col("plen")).cast("long").as("deg"))
      val sc = pt.join(broadcast(wsc), Seq("tok"))
        .groupBy(col("doc_id"), col("grp"))
        .agg(expr("CAST(SUM((deg * 1000000) div freq) AS BIGINT)")
            .as("score_ppm"),
          expr("concat_ws(' ', transform(" +
            "array_sort(collect_list(struct(i, tok))), x -> x.tok))")
            .as("phrase"))
      sc.groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occurrences"),
          max(col("score_ppm")).as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("phrase"))
        .limit(20)
        .select(col("phrase"), col("n_occurrences"), col("score_ppm"))
    },

    // Moving-average type-token ratio (MATTR, window 20) — the
    // length-robust lexical-diversity score (plain TTR collapses as
    // docs grow; MATTR compares a tweet and a book on one scale).
    // Naively O(n·w) distinct-counts per doc; here ONE pass via the
    // first-occurrence identity: position i counts as distinct in
    // exactly the windows starting after its previous occurrence —
    // max(0, min(i, n−w) − max(0, i−w+1, prev+1) + 1) of them — so
    // Σwindows distinct(w) is a plain integer sum over positions. The
    // only shuffle keys are (doc, token) for the prev-position lag;
    // everything else is per-doc arithmetic, exact to the ppm.
    QuerySpec.sql(
      "text_mattr",
      """WITH tok AS (
        |  SELECT doc_id, i - 1 AS i, ws[i] AS tok,
        |    CAST(len(ws) AS BIGINT) AS n
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents) d,
        |    LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t
        |  WHERE len(ws) >= 20),
        |pr AS (
        |  SELECT doc_id, i, n,
        |    LAG(i) OVER (PARTITION BY doc_id, tok ORDER BY i) AS prev
        |  FROM tok),
        |c AS (
        |  SELECT doc_id, n,
        |    GREATEST(0, LEAST(i, n - 20)
        |      - GREATEST(0, i - 19, COALESCE(prev + 1, 0)) + 1)
        |      AS contrib
        |  FROM pr)
        |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
        |  CAST(MAX(n) - 19 AS BIGINT) AS n_windows,
        |  CAST(SUM(contrib) * 1000000 // ((MAX(n) - 19) * 20)
        |    AS BIGINT) AS mattr_ppm
        |FROM c GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val tok = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 20)
        .select(col("doc_id"), size(col("ws")).cast("long").as("n"),
          posexplode(col("ws")).as(Seq("i", "tok")))
      val w = Window.partitionBy(col("doc_id"), col("tok"))
        .orderBy(col("i"))
      tok.withColumn("prev", lag(col("i"), 1).over(w))
        .select(col("doc_id"), col("n"),
          expr("GREATEST(0, LEAST(i, n - 20)" +
            " - GREATEST(0, i - 19, COALESCE(prev + 1, 0)) + 1)")
            .as("contrib"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_tokens"),
          (max(col("n")) - 19).as("n_windows"),
          expr("CAST(SUM(contrib) * 1000000" +
            " div ((MAX(n) - 19) * 20) AS BIGINT)").as("mattr_ppm"))
        .orderBy(col("doc_id"))
    },

    // Tokenizer fertility per source — the multilingual tokenizer-
    // health metric (tokens emitted per word): a domain whose
    // fertility is far above the corpus norm is poorly served by the
    // trained vocabulary (its text costs more sequence length per
    // word), the signal that drives vocab-size and mix decisions.
    // Same trained-dictionary join as text_bpe_apply (the bpeModel
    // memo is shared — the tokenizer trains once), folded to source
    // grain: exact integer fertility and compression ppm.
    QuerySpec.sql(
      "curate_tokenizer_fertility", {
        val rounds = 5
        s"""WITH ${bpeChainCtes(rounds, finalDict = true)},
           |wsym AS (
           |  SELECT word,
           |    CAST(len(string_split(trim(enc, '|'), '||')) AS BIGINT)
           |      AS n_syms,
           |    CAST(length(word) AS BIGINT) AS n_chars
           |  FROM d$rounds),
           |tok AS (
           |  SELECT source, unnest(list_filter(
           |      regexp_extract_all(lower(text), '[a-z]+'),
           |      t -> length(t) >= 2)) AS word
           |  FROM documents)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
           |  CAST(SUM(n_syms) AS BIGINT) AS n_tokens,
           |  CAST((SUM(n_syms) * 1000000) // COUNT(*) AS BIGINT)
           |    AS fertility_ppm,
           |  CAST((SUM(n_syms) * 1000000) // SUM(n_chars) AS BIGINT)
           |    AS tokens_per_char_ppm
           |FROM tok JOIN wsym USING (word)
           |GROUP BY source
           |ORDER BY source""".stripMargin
      }) { (s, dir) =>
      val (_, dict) = bpeModel(s, dir)
      val wsym = dict.select(col("word"),
        size(col("syms")).cast("long").as("n_syms"),
        length(col("word")).cast("long").as("n_chars"))
      docs(s, dir)
        .select(col("source"), explode(expr(
          """filter(regexp_extract_all(lower(text), '[a-z]+', 0),
            |  t -> length(t) >= 2)""".stripMargin)).as("word"))
        .join(wsym, Seq("word"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_syms")).cast("long").as("n_tokens"),
          expr("CAST(SUM(n_syms) * 1000000 div COUNT(*) AS BIGINT)")
            .as("fertility_ppm"),
          expr("CAST(SUM(n_syms) * 1000000 div SUM(n_chars) AS BIGINT)")
            .as("tokens_per_char_ppm"))
        .orderBy(col("source"))
    },

    // Vocabulary growth (Heaps'-law curve): cumulative distinct terms
    // vs cumulative tokens as the corpus grows doc-bucket by
    // doc-bucket — the curve that says whether a corpus keeps paying
    // vocabulary for more data or has gone repetitive. The trick that
    // makes "cumulative distinct" one pass instead of ten rescans:
    // each term counts toward the bucket where it FIRST appears
    // (min(b) per term), and the prefix sum of those first-appearance
    // counts IS the cumulative vocabulary. Two keyed aggregates
    // (bucket grain, term grain) + a 10-row window.
    QuerySpec.sql(
      "text_vocab_growth",
      """WITH mx AS (SELECT MAX(doc_id) AS mid FROM documents),
        |tb AS (
        |  SELECT (d.doc_id * 10) // (mx.mid + 1) AS b, d.doc_id, d.text
        |  FROM documents d, mx),
        |tok AS (SELECT b, doc_id,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM tb),
        |per_b AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM tok GROUP BY 1),
        |new_v AS (SELECT fb AS b, CAST(COUNT(*) AS BIGINT) AS nv
        |  FROM (SELECT tok, MIN(b) AS fb FROM tok GROUP BY 1) f
        |  GROUP BY 1)
        |SELECT b AS bucket,
        |  CAST(SUM(n_docs) OVER cum AS BIGINT) AS cum_docs,
        |  CAST(SUM(n_tok) OVER cum AS BIGINT) AS cum_tokens,
        |  CAST(SUM(COALESCE(nv, 0)) OVER cum AS BIGINT) AS cum_vocab
        |FROM per_b LEFT JOIN new_v USING (b)
        |WINDOW cum AS (ORDER BY b
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      val mx = docs(s, dir).agg(max(col("doc_id")).as("mid"))
      val tok = docs(s, dir).crossJoin(broadcast(mx))
        .select(expr("(doc_id * 10) div (mid + 1)").as("b"),
          col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val perB = tok.groupBy(col("b"))
        .agg(count(lit(1)).as("n_tok"),
          countDistinct(col("doc_id")).as("n_docs"))
      val newV = tok.groupBy(col("tok")).agg(min(col("b")).as("fb"))
        .groupBy(col("fb")).agg(count(lit(1)).as("nv"))
      // 10-row frame: the window input is bucket-grain, never row-grain
      val cum = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perB.join(newV, col("b") === col("fb"), "left").drop("fb")
        .select(col("b").as("bucket"),
          sum(col("n_docs")).over(cum).as("cum_docs"),
          sum(col("n_tok")).over(cum).as("cum_tokens"),
          sum(coalesce(col("nv"), lit(0L))).over(cum).as("cum_vocab"))
        .orderBy(col("bucket"))
    },

    // Zipf-law fit per source: regress ln(freq) on ln(rank) over each
    // domain's top-100 terms — the corpus-health diagnostic (natural
    // text sits near slope −1; template/boilerplate shows up as a
    // flat or cliff-shaped curve). Term counts collapse map-side to
    // the per-source vocab; the rank window partitions by SOURCE over
    // that aggregated table (never the token stream). Both ln's are
    // micro-quantized so the regression's sufficient statistics are
    // exact longs; slope and r² compile from one shared expression
    // text over those longs (the LinReg discipline).
    QuerySpec.sql(
      "text_zipf_fit", {
        val num = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        val denx = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        val deny = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)" +
          " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
        val slope = s"CASE WHEN $denx <> 0 THEN $num / $denx END"
        val r2 = s"CASE WHEN $denx <> 0 AND $deny <> 0" +
          s" THEN $num * $num / ($denx * $deny) END"
        s"""WITH v AS (
           |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY 1, 2),
           |r AS (
           |  SELECT source, c, ROW_NUMBER() OVER (PARTITION BY source
           |    ORDER BY c DESC, tok) AS rk
           |  FROM v),
           |p AS (
           |  SELECT source,
           |    CAST(CAST(ln(CAST(rk AS DOUBLE)) AS DECIMAL(18,6))
           |      * 1000000 AS BIGINT) AS xm,
           |    CAST(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,6))
           |      * 1000000 AS BIGINT) AS ym
           |  FROM r WHERE rk <= 100),
           |st AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(xm) AS BIGINT) AS sx,
           |    CAST(SUM(ym) AS BIGINT) AS sy,
           |    CAST(SUM(xm * xm) AS BIGINT) AS sxx,
           |    CAST(SUM(xm * ym) AS BIGINT) AS sxy,
           |    CAST(SUM(ym * ym) AS BIGINT) AS syy
           |  FROM p GROUP BY 1)
           |SELECT source, n AS n_terms, $slope AS zipf_slope, $r2 AS r2
           |FROM st ORDER BY source""".stripMargin
      }) { (s, dir) =>
      val num = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
      val denx = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      val deny = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)" +
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
      val slope = s"CASE WHEN $denx <> 0 THEN $num / $denx END"
      val r2 = s"CASE WHEN $denx <> 0 AND $deny <> 0" +
        s" THEN $num * $num / ($denx * $deny) END"
      val v = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("tok"))
      v.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 100)
        .select(col("source"),
          graft.functions.Cols.micros6(log(col("rk").cast("double")))
            .as("xm"),
          graft.functions.Cols.micros6(log(col("c").cast("double")))
            .as("ym"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("xm")).cast("long").as("sx"),
          sum(col("ym")).cast("long").as("sy"),
          sum(col("xm") * col("xm")).cast("long").as("sxx"),
          sum(col("xm") * col("ym")).cast("long").as("sxy"),
          sum(col("ym") * col("ym")).cast("long").as("syy"))
        .select(col("source"), col("n").as("n_terms"),
          expr(slope).as("zipf_slope"), expr(r2).as("r2"))
        .orderBy(col("source"))
    },

    // Quality scoring: stopword ratio + vocabulary-diversity ratio,
    // combined into a deterministic score. explode → per-doc aggregate.
    QuerySpec.sql(
      "text_quality_score",
      s"""SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |  COUNT(DISTINCT tok) AS n_distinct,
         |  CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS stop_ratio,
         |  CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) AS distinct_ratio,
         |  0.3 * (CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))
         |  + 0.7 * (CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*)) AS quality
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |      FROM documents)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // per-document array functions instead of explode + groupBy: the
      // oracle keeps the unnest formulation, the Spark plan computes
      // identical values map-side with NO shuffle at all
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN ${inList(langMarkers.head._2)})) AS BIGINT)")
            .as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
        .withColumn("distinct_ratio", col("n_distinct").cast("double") / col("n_tokens"))
        .withColumn("quality",
          lit(0.3) * col("stop_ratio") + lit(0.7) * col("distinct_ratio"))
        .orderBy(col("doc_id"))
    },

    // ROC-AUC of the quality score — the model-eval number a scoring
    // pipeline reports before its threshold ships: does the composite
    // quality score actually discriminate the `en` class? AUC is the
    // Mann-Whitney statistic in disguise, so it computes EXACTLY: the
    // score folds to an integer micro-score per doc (one rational,
    // floor-quantized identically in both engines), ranks come from
    // the per-distinct-score histogram through the range-partitioned
    // two-pass PrefixSum (tie-averaged, ×2-scaled — no global-sort
    // window), and AUC_micro = U₁ₓ₂·10⁶ div (2·n₊·n₋) is an exact
    // integer. Headroom to ~3·10⁹ docs per class before the product
    // needs HUGEINT.
    QuerySpec.sql(
      "eval_score_auc",
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) AS score
         |  FROM q),
         |s AS (
         |  SELECT score, CAST(SUM(pos) AS BIGINT) AS c1,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM sc GROUP BY 1),
         |r AS (SELECT score, c1, c,
         |    COALESCE(SUM(c) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumb
         |  FROM s),
         |agg AS (SELECT
         |    CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c - c1) AS BIGINT) AS n2,
         |    CAST(SUM(c1 * (2 * cumb + c + 1)) AS BIGINT) AS r1_x2
         |  FROM r)
         |SELECT n1 AS n_pos, n2 AS n_neg,
         |  CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
         |  CAST((r1_x2 - n1 * (n1 + 1)) * 1000000 // (2 * n1 * n2)
         |    AS BIGINT) AS auc_micro
         |FROM agg""".stripMargin) { (s, dir) =>
      import graft.functions.PrefixSum
      val hist = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CAST((3 * n_stop + 7 * n_distinct) * 1000000 div " +
            "(10 * n_tokens) AS BIGINT)").as("score"))
        .groupBy(col("score"))
        .agg(sum(col("pos")).as("c1"), count(lit(1)).as("c"))
      PrefixSum.globalCumsum(hist, Seq(col("score")), col("c"), "cum")
        .withColumn("cumb", col("cum") - col("c"))
        .agg(sum(col("c1")).cast("long").as("n1"),
          sum(col("c") - col("c1")).cast("long").as("n2"),
          sum(col("c1") * (lit(2) * col("cumb") + col("c") + lit(1)))
            .cast("long").as("r1_x2"))
        .select(col("n1").as("n_pos"), col("n2").as("n_neg"),
          expr("CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT)").as("u1_x2"),
          expr("CAST((r1_x2 - n1 * (n1 + 1)) * 1000000 div " +
            "(2 * n1 * n2) AS BIGINT)").as("auc_micro"))
    },

    // Precision/recall/F1 CURVE over the same integer quality score —
    // the threshold-picking readout beside eval_score_auc's
    // ranking-quality number. Nine fixed micro-score thresholds
    // overlay the per-distinct-score histogram (never the docs) as a
    // broadcast grid; each point's P/R/F1 is an exact integer ppm
    // (F1 = 2TP/(pred+pos) — no float harmonic mean). The expensive
    // pass (tokenize + score) happens once; the curve costs a
    // |scores|×9 overlay.
    QuerySpec.sql(
      "eval_pr_curve",
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) AS score
         |  FROM q),
         |s AS (
         |  SELECT score, CAST(SUM(pos) AS BIGINT) AS c1,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM sc GROUP BY 1),
         |np AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_pos FROM s),
         |g AS (SELECT CAST(k * 100000 AS BIGINT) AS thr
         |  FROM (SELECT UNNEST(range(1, 10)) AS k) kk),
         |p AS (
         |  SELECT thr, CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS tp,
         |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS pred
         |  FROM g LEFT JOIN s ON s.score >= g.thr GROUP BY 1)
         |SELECT thr AS threshold_micro, tp, pred AS n_predicted, n_pos,
         |  CAST(CASE WHEN pred > 0 THEN tp * 1000000 // pred END
         |    AS BIGINT) AS precision_ppm,
         |  CAST(CASE WHEN n_pos > 0 THEN tp * 1000000 // n_pos END
         |    AS BIGINT) AS recall_ppm,
         |  CAST(CASE WHEN pred + n_pos > 0 THEN
         |    2 * tp * 1000000 // (pred + n_pos) END AS BIGINT) AS f1_ppm
         |FROM p, np ORDER BY threshold_micro""".stripMargin) { (s, dir) =>
      import s.implicits._
      val hist = docs(s, dir)
        .select(col("lang"), split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CAST((3 * n_stop + 7 * n_distinct) * 1000000 div " +
            "(10 * n_tokens) AS BIGINT)").as("score"))
        .groupBy(col("score"))
        .agg(sum(col("pos")).as("c1"), count(lit(1)).as("c"))
      val histM = Materialize.stable(hist)
      val np = histM.agg(sum(col("c1")).cast("long").as("n_pos"))
      val g = Seq.range(1, 10).map(_ * 100000L).toDF("thr")
      histM.join(broadcast(g), col("score") >= col("thr"), "right")
        .groupBy(col("thr").as("threshold_micro"))
        .agg(coalesce(sum(col("c1")), lit(0L)).cast("long").as("tp"),
          coalesce(sum(col("c")), lit(0L)).cast("long").as("pred"))
        .crossJoin(broadcast(np))
        .select(col("threshold_micro"), col("tp"),
          col("pred").as("n_predicted"), col("n_pos"),
          expr("CAST(CASE WHEN pred > 0 THEN tp * 1000000 div pred " +
            "END AS BIGINT)").as("precision_ppm"),
          expr("CAST(CASE WHEN n_pos > 0 THEN tp * 1000000 div n_pos " +
            "END AS BIGINT)").as("recall_ppm"),
          expr("CAST(CASE WHEN pred + n_pos > 0 THEN " +
            "2 * tp * 1000000 div (pred + n_pos) END AS BIGINT)")
            .as("f1_ppm"))
        .orderBy(col("threshold_micro"))
    },

    // Calibration diagnostic (reliability table / ECE decomposition)
    // over the same micro-score-vs-en-label pair the AUC and PR-curve
    // gates read: ten fixed score deciles, and per bin the predicted
    // confidence (mean score — already ppm, so the mean is an exact
    // integer division of a sum) against the observed positive rate.
    // AUC measures RANKING quality; this measures whether the score
    // MEANS what it says (a 0.8-scored doc should be positive ~80% of
    // the time) — the property threshold-picking and downstream
    // mixing weights actually rely on. All integers: gap_ppm =
    // |acc−conf| and the bin's ECE contribution n·gap are exact, so
    // the classically-float Expected Calibration Error hash-compares.
    // Plan: the one tokenize+score pass, a 10-ary groupBy — no
    // window, no second pass.
    QuerySpec.sql(
      "eval_calibration_bins",
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) AS score
         |  FROM q),
         |b AS (
         |  SELECT LEAST(score // 100000, 9) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(pos) AS BIGINT) AS n_pos,
         |    CAST(SUM(score) AS BIGINT) AS score_sum
         |  FROM sc GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
         |  CAST(score_sum // n AS BIGINT) AS conf_ppm,
         |  CAST(n_pos * 1000000 // n AS BIGINT) AS acc_ppm,
         |  CAST(ABS(score_sum // n - n_pos * 1000000 // n) AS BIGINT)
         |    AS gap_ppm,
         |  CAST(n * ABS(score_sum // n - n_pos * 1000000 // n)
         |    AS BIGINT) AS ece_contrib
         |FROM b ORDER BY bin""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CAST((3 * n_stop + 7 * n_distinct) * 1000000 div " +
            "(10 * n_tokens) AS BIGINT)").as("score"))
        .groupBy(least(expr("score div 100000"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
          sum(col("score")).as("score_sum"))
        .select(col("bin").cast("long").as("bin"), col("n"),
          col("n_pos"),
          expr("CAST(score_sum div n AS BIGINT)").as("conf_ppm"),
          expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("acc_ppm"),
          expr("CAST(ABS(score_sum div n - n_pos * 1000000 div n) " +
            "AS BIGINT)").as("gap_ppm"),
          expr("CAST(n * ABS(score_sum div n - n_pos * 1000000 div n)" +
            " AS BIGINT)").as("ece_contrib"))
        .orderBy(col("bin"))
    },

    // Multiclass confusion matrix of the language-ID heuristic
    // against the labeled truth — the eval readout every classifier
    // in the curation stack owes its users (the binary AUC/PR/
    // calibration gates read a score; this reads the DECISION). The
    // prediction chain is reduced to pure integer hit-count
    // comparisons (provably the text_lang_id decision: all scores
    // share the per-doc denominator), shared verbatim with the
    // oracle. One tokenize pass, one |classes|²-bounded groupBy.
    QuerySpec.sql(
      "eval_confusion_matrix",
      s"""WITH $langCmCte
         |SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         |FROM cm GROUP BY 1, 2
         |ORDER BY true_lang, pred_lang""".stripMargin) { (s, dir) =>
      langCm(s, dir)
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("true_lang"), col("pred_lang"))
    },

    // Per-class precision/recall/F1 from the same confusion surface —
    // class set = truth ∪ predictions (a class the model never
    // predicts still gets its recall row; a hallucinated class gets
    // precision 0/NULL-guarded). All exact integer ppm; F1 =
    // 2·tp/(n_pred + n_true), the same no-float harmonic-mean
    // identity as eval_pr_curve.
    QuerySpec.sql(
      "eval_multiclass_prf",
      s"""WITH $langCmCte,
         |m AS (
         |  SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM cm GROUP BY 1, 2),
         |cls AS (
         |  SELECT DISTINCT true_lang AS class FROM m
         |  UNION
         |  SELECT DISTINCT pred_lang FROM m),
         |tr AS (SELECT true_lang AS class, CAST(SUM(n) AS BIGINT)
         |  AS n_true FROM m GROUP BY 1),
         |pr AS (SELECT pred_lang AS class, CAST(SUM(n) AS BIGINT)
         |  AS n_pred FROM m GROUP BY 1),
         |dg AS (SELECT true_lang AS class, CAST(SUM(n) AS BIGINT)
         |  AS tp FROM m WHERE true_lang = pred_lang GROUP BY 1)
         |SELECT cls.class,
         |  COALESCE(dg.tp, 0) AS tp,
         |  COALESCE(tr.n_true, 0) AS n_true,
         |  COALESCE(pr.n_pred, 0) AS n_pred,
         |  CAST(CASE WHEN COALESCE(pr.n_pred, 0) > 0 THEN
         |    COALESCE(dg.tp, 0) * 1000000 // pr.n_pred END AS BIGINT)
         |    AS precision_ppm,
         |  CAST(CASE WHEN COALESCE(tr.n_true, 0) > 0 THEN
         |    COALESCE(dg.tp, 0) * 1000000 // tr.n_true END AS BIGINT)
         |    AS recall_ppm,
         |  CAST(CASE WHEN COALESCE(pr.n_pred, 0) + COALESCE(tr.n_true, 0)
         |      > 0 THEN 2 * COALESCE(dg.tp, 0) * 1000000
         |    // (COALESCE(pr.n_pred, 0) + COALESCE(tr.n_true, 0))
         |    END AS BIGINT) AS f1_ppm
         |FROM cls
         |LEFT JOIN tr ON tr.class = cls.class
         |LEFT JOIN pr ON pr.class = cls.class
         |LEFT JOIN dg ON dg.class = cls.class
         |ORDER BY cls.class""".stripMargin) { (s, dir) =>
      val m = graft.functions.Materialize.stable(langCm(s, dir)
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n")))
      val cls = m.select(col("true_lang").as("class"))
        .union(m.select(col("pred_lang"))).distinct()
      val tr = m.groupBy(col("true_lang").as("class"))
        .agg(sum(col("n")).cast("long").as("n_true"))
      val pr = m.groupBy(col("pred_lang").as("class"))
        .agg(sum(col("n")).cast("long").as("n_pred"))
      val dg = m.filter(col("true_lang") === col("pred_lang"))
        .groupBy(col("true_lang").as("class"))
        .agg(sum(col("n")).cast("long").as("tp"))
      cls.join(tr, Seq("class"), "left")
        .join(pr, Seq("class"), "left")
        .join(dg, Seq("class"), "left")
        .select(col("class"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("n_true"), lit(0L)).as("n_true"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"))
        .select(col("class"), col("tp"), col("n_true"), col("n_pred"),
          expr("CAST(CASE WHEN n_pred > 0 THEN tp * 1000000 div n_pred" +
            " END AS BIGINT)").as("precision_ppm"),
          expr("CAST(CASE WHEN n_true > 0 THEN tp * 1000000 div n_true" +
            " END AS BIGINT)").as("recall_ppm"),
          expr("CAST(CASE WHEN n_pred + n_true > 0 THEN " +
            "2 * tp * 1000000 div (n_pred + n_true) END AS BIGINT)")
            .as("f1_ppm"))
        .orderBy(col("class"))
    },

    // Cohen's kappa over the same confusion surface — chance-corrected
    // agreement between the lang-id prediction and the truth labels
    // (plain accuracy rewards a majority-class guesser; kappa
    // subtracts the marginal-product chance term). ONE exact rational:
    // kappa = (n·agree − Σ m_c·k_c) / (n² − Σ m_c·k_c) with m/k the
    // row/column marginals — numerator and denominator are plain
    // integer cross-products of the (tiny) contingency table, and the
    // micro value is a single integer division (both engines truncate
    // toward zero, so negative kappa agrees too). Headroom: n²·10⁶
    // needs n ≲ 3·10⁶ docs before the division goes HUGEINT. Plan:
    // the one langCm pass, then arithmetic on the collected-size
    // contingency — no second scan.
    QuerySpec.sql(
      "eval_cohens_kappa",
      s"""WITH $langCmCte,
         |m AS (
         |  SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM cm GROUP BY 1, 2),
         |tr AS (SELECT true_lang AS class, CAST(SUM(n) AS BIGINT)
         |  AS n_true FROM m GROUP BY 1),
         |pr AS (SELECT pred_lang AS class, CAST(SUM(n) AS BIGINT)
         |  AS n_pred FROM m GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
         |  CAST(COALESCE(SUM(CASE WHEN true_lang = pred_lang THEN n
         |    END), 0) AS BIGINT) AS agree FROM m),
         |pe AS (SELECT CAST(COALESCE(SUM(tr.n_true * pr.n_pred), 0)
         |    AS BIGINT) AS pe_num
         |  FROM tr JOIN pr ON tr.class = pr.class)
         |SELECT n, agree, pe_num,
         |  CAST(CASE WHEN n * n > pe_num THEN
         |    (n * agree - pe_num) * 1000000 // (n * n - pe_num)
         |    END AS BIGINT) AS kappa_micro
         |FROM tot, pe""".stripMargin) { (s, dir) =>
      val m = graft.functions.Materialize.stable(langCm(s, dir)
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n")))
      val tr = m.groupBy(col("true_lang").as("class"))
        .agg(sum(col("n")).cast("long").as("n_true"))
      val pr = m.groupBy(col("pred_lang").as("class"))
        .agg(sum(col("n")).cast("long").as("n_pred"))
      val tot = m.agg(sum(col("n")).cast("long").as("n"),
        coalesce(sum(when(col("true_lang") === col("pred_lang"),
          col("n"))), lit(0L)).cast("long").as("agree"))
      val pe = tr.join(pr, Seq("class"))
        .agg(coalesce(sum(col("n_true") * col("n_pred")), lit(0L))
          .cast("long").as("pe_num"))
      tot.crossJoin(broadcast(pe))
        .select(col("n"), col("agree"), col("pe_num"),
          expr("CAST(CASE WHEN n * n > pe_num THEN " +
            "(n * agree - pe_num) * 1000000 div (n * n - pe_num) " +
            "END AS BIGINT)").as("kappa_micro"))
    },

    // Lift / gains table over the quality-score ranking — the
    // campaign-targeting readout beside AUC (same micro-score, same
    // en label): rank docs by score DESC, and at each of ten cum-count
    // deciles report the captured-positive fraction (gains) and the
    // capture rate vs random (lift). Deciles are picked on the
    // per-distinct-score HISTOGRAM (the smallest cumulative count
    // covering i/10 of the corpus — deterministic under ties, no
    // row-level ranking), cumsums come from the range-partitioned
    // PrefixSum (no unpartitioned window, unlike the oracle's), and
    // both ratios are exact integer ppm. Plan: one tokenize+score
    // pass, one |scores|-row cumsum, a 10-row broadcast grid.
    QuerySpec.sql(
      "eval_lift_gains",
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) AS score
         |  FROM q),
         |s AS (
         |  SELECT score, CAST(SUM(pos) AS BIGINT) AS c1,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM sc GROUP BY 1),
         |r AS (SELECT score,
         |    CAST(SUM(c) OVER (ORDER BY score DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_n,
         |    CAST(SUM(c1) OVER (ORDER BY score DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_pos
         |  FROM s),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
         |  CAST(SUM(c1) AS BIGINT) AS n_pos FROM s),
         |g AS (SELECT UNNEST(range(1, 11)) AS decile),
         |pick AS (
         |  SELECT g.decile, MIN(r.cum_n) AS cum_n
         |  FROM g, tot, r WHERE r.cum_n * 10 >= g.decile * tot.n
         |  GROUP BY 1)
         |SELECT CAST(p.decile AS BIGINT) AS decile, p.cum_n, r.cum_pos,
         |  tot.n_pos,
         |  CAST(r.cum_pos * 1000000 // tot.n_pos AS BIGINT) AS gains_ppm,
         |  CAST(r.cum_pos * tot.n * 1000000 // (p.cum_n * tot.n_pos)
         |    AS BIGINT) AS lift_ppm
         |FROM pick p, r, tot WHERE r.cum_n = p.cum_n
         |ORDER BY decile""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.functions.PrefixSum
      val hist = docs(s, dir)
        .select(col("lang"), split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CAST((3 * n_stop + 7 * n_distinct) * 1000000 div " +
            "(10 * n_tokens) AS BIGINT)").as("score"))
        .groupBy(col("score"))
        .agg(sum(col("pos")).as("c1"), count(lit(1)).as("c"))
      // cumsums in score-DESC order: PrefixSum sorts ascending, so key
      // on the negated score
      val r = graft.functions.Materialize.stable(
        PrefixSum.globalCumsumMulti(
          hist.withColumn("neg_score", -col("score")),
          Seq(col("neg_score")),
          Seq((col("c"), "cum_n"), (col("c1"), "cum_pos"))))
      // totals from the cumsum maxima (the PrefixSum discipline: never
      // rescan for what the last partial already holds)
      val tot = r.agg(max(col("cum_n")).cast("long").as("n"),
        max(col("cum_pos")).cast("long").as("n_pos"))
      val g = Seq.range(1, 11).map(_.toLong).toDF("decile")
      val rt = r.select(col("cum_n"), col("cum_pos"))
        .crossJoin(broadcast(tot))
      rt.join(broadcast(g), col("cum_n") * 10 >= col("decile") * col("n"))
        .groupBy(col("decile"))
        .agg(min(col("cum_n")).as("cum_n"))
        .join(rt, Seq("cum_n"))
        .select(col("decile"), col("cum_n"), col("cum_pos"),
          col("n_pos"),
          expr("CAST(cum_pos * 1000000 div n_pos AS BIGINT)")
            .as("gains_ppm"),
          expr("CAST(cum_pos * n * 1000000 div (cum_n * n_pos) " +
            "AS BIGINT)").as("lift_ppm"))
        .orderBy(col("decile"))
    },

    // Brier score + per-bin reliability (the Murphy-decomposition
    // numerators) over the same micro-score-vs-en-label pair: the
    // calibration-bins gate reports |acc − conf| per bin; this one
    // reports the proper-scoring-rule view — the per-bin Brier mass
    // Σ(p − y)² (pico units: p is the micro score, so each square is
    // exact ≤ 10¹²) and the reliability numerator n_b(p̄_b − ō_b)² as
    // the exact integer (S_b − 10⁶·O_b)²//n_b (the square passes 2^63
    // at sf0.1, so it rides HUGEINT ≡ DECIMAL(38,0); the quotient is
    // ≤ 10¹²·n_b and lands back in BIGINT). All floor divisions are
    // nonneg-by-construction, so // ≡ div ≡ floor in both engines.
    // Plan: the one tokenize+score pass, a 10-ary groupBy.
    QuerySpec.sql(
      "eval_brier_reliability",
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) AS score
         |  FROM q),
         |b AS (
         |  SELECT LEAST(score // 100000, 9) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(pos) AS BIGINT) AS n_pos,
         |    CAST(SUM(score) AS BIGINT) AS score_sum,
         |    CAST(SUM((score - pos * 1000000)
         |      * (score - pos * 1000000)) AS BIGINT) AS brier_num
         |  FROM sc GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos, score_sum,
         |  brier_num,
         |  CAST(brier_num // (n * 1000000) AS BIGINT)
         |    AS bin_brier_micro,
         |  CAST((CAST(score_sum - 1000000 * n_pos AS HUGEINT)
         |    * (score_sum - 1000000 * n_pos)) // n AS BIGINT)
         |    AS reliability_pico
         |FROM b ORDER BY bin""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("lang"), split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CAST((3 * n_stop + 7 * n_distinct) * 1000000 div " +
            "(10 * n_tokens) AS BIGINT)").as("score"))
        .groupBy(expr("LEAST(score div 100000, 9)").as("bin"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("pos")).cast("long").as("n_pos"),
          sum(col("score")).cast("long").as("score_sum"),
          sum((col("score") - col("pos") * 1000000L) *
            (col("score") - col("pos") * 1000000L)).cast("long")
            .as("brier_num"))
        .select(col("bin"), col("n"), col("n_pos"), col("score_sum"),
          col("brier_num"),
          expr("CAST(brier_num div (n * 1000000) AS BIGINT)")
            .as("bin_brier_micro"),
          expr("CAST(CAST(score_sum - 1000000 * n_pos " +
            "AS DECIMAL(38,0)) * (score_sum - 1000000 * n_pos) div n " +
            "AS BIGINT)").as("reliability_pico"))
        .orderBy(col("bin"))
    },

    // Per-token burstiness (Fano factor of per-document counts): does
    // a token cluster into few documents (topical, Fano ≫ 1) or
    // spread evenly (functional, Fano ≈ its mean-dependent floor)?
    // The index of dispersion Var/Mean over ALL n docs — zero-count
    // docs included implicitly, since S and Q only read docs that
    // contain the token — is ONE exact integer rational:
    // fano_ppm = (n·Q − S²)·10⁶ // (n·S), numerator in HUGEINT ≡
    // DECIMAL(38,0) (n·Q·10⁶ passes 2^63 on stopword-scale postings
    // past the test SFs — keep the engines' overflow behavior
    // symmetric, not wrap-vs-raise). df ≥ 5 keeps hapax noise
    // out. Plan: one tokenize pass, two hash aggregates keyed by
    // token — posting-list-free, no window.
    QuerySpec.sql(
      "text_burstiness",
      """WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents),
        |tc AS (SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t
        |  GROUP BY 1, 2),
        |ag AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
        |    CAST(SUM(x) AS BIGINT) AS s,
        |    CAST(SUM(x * x) AS BIGINT) AS q
        |  FROM tc GROUP BY 1)
        |SELECT tok, df, s, q,
        |  CAST((CAST(nd.n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
        |    * 1000000 // (nd.n * s) AS BIGINT)
        |    AS fano_ppm
        |FROM ag, nd WHERE df >= 5
        |ORDER BY tok""".stripMargin) { (s, dir) =>
      val nd = docs(s, dir).agg(count(lit(1)).cast("long").as("n"))
      docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).cast("long").as("x"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).cast("long").as("df"),
          sum(col("x")).cast("long").as("s"),
          sum(col("x") * col("x")).cast("long").as("q"))
        .filter(col("df") >= 5)
        .crossJoin(broadcast(nd))
        .select(col("tok"), col("df"), col("s"), col("q"),
          expr("CAST((CAST(n AS DECIMAL(38,0)) * q " +
            "- CAST(s AS DECIMAL(38,0)) * s) " +
            "* 1000000 div (n * s) AS BIGINT)")
            .as("fano_ppm"))
        .orderBy(col("tok"))
    },

    // Matthews correlation coefficient of the strict-cut classifier
    // (score ≥ 0.5 predicts en) against the truth label — the
    // single-number binary-classifier summary that stays honest under
    // class imbalance (accuracy and F1 both don't). The exact part:
    // num = TP·TN − FP·FN and the four marginals are plain integers,
    // and the SIGNED SQUARE mcc²·sign(num) is one exact rational
    // (num²·10⁶ // Π marginals, products in HUGEINT ≡ DECIMAL(38,0)).
    // mcc_micro itself needs a sqrt, so it rides the shared-expression
    // discipline (identical text in both engines over the same exact
    // integers — the MwZ precedent; IEEE sqrt is correctly rounded,
    // so the doubles are bit-identical). Plan: one tokenize+score
    // pass, one 4-way fold.
    QuerySpec.sql(
      "eval_mcc", {
      val mcc = "CASE WHEN tp + fp > 0 AND tp + fn_ > 0 AND tn + fp > 0 " +
        "AND tn + fn_ > 0 THEN CAST(FLOOR((CAST(tp AS DOUBLE) " +
        "* CAST(tn AS DOUBLE) - CAST(fp AS DOUBLE) " +
        "* CAST(fn_ AS DOUBLE)) / sqrt(CAST(tp + fp AS DOUBLE) " +
        "* CAST(tp + fn_ AS DOUBLE) * CAST(tn + fp AS DOUBLE) " +
        "* CAST(tn + fn_ AS DOUBLE)) * 1000000) AS BIGINT) END"
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CASE WHEN CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) >= 500000
         |      THEN 1 ELSE 0 END AS pred
         |  FROM q),
         |cm AS (
         |  SELECT
         |    CAST(SUM(pos * pred) AS BIGINT) AS tp,
         |    CAST(SUM((1 - pos) * pred) AS BIGINT) AS fp,
         |    CAST(SUM(pos * (1 - pred)) AS BIGINT) AS fn_,
         |    CAST(SUM((1 - pos) * (1 - pred)) AS BIGINT) AS tn
         |  FROM sc)
         |SELECT tp, fp, fn_, tn,
         |  CAST(tp * tn - fp * fn_ AS BIGINT) AS num,
         |  CAST(CASE WHEN tp + fp > 0 AND tp + fn_ > 0
         |      AND tn + fp > 0 AND tn + fn_ > 0 THEN
         |    (CASE WHEN tp * tn - fp * fn_ < 0 THEN -1 ELSE 1 END)
         |    * (CAST(tp * tn - fp * fn_ AS HUGEINT)
         |       * (tp * tn - fp * fn_)) * 1000000
         |    // (CAST((tp + fp) AS HUGEINT) * (tp + fn_)
         |       * (tn + fp) * (tn + fn_)) END AS BIGINT)
         |    AS mcc_sq_signed_micro,
         |  $mcc AS mcc_micro
         |FROM cm""".stripMargin }) { (s, dir) =>
      val mcc = "CASE WHEN tp + fp > 0 AND tp + fn_ > 0 AND tn + fp > 0 " +
        "AND tn + fn_ > 0 THEN CAST(FLOOR((CAST(tp AS DOUBLE) " +
        "* CAST(tn AS DOUBLE) - CAST(fp AS DOUBLE) " +
        "* CAST(fn_ AS DOUBLE)) / sqrt(CAST(tp + fp AS DOUBLE) " +
        "* CAST(tp + fn_ AS DOUBLE) * CAST(tn + fp AS DOUBLE) " +
        "* CAST(tn + fn_ AS DOUBLE)) * 1000000) AS BIGINT) END"
      docs(s, dir)
        .select(col("lang"), split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CASE WHEN CAST((3 * n_stop + 7 * n_distinct) * " +
            "1000000 div (10 * n_tokens) AS BIGINT) >= 500000 " +
            "THEN 1L ELSE 0L END").as("pred"))
        .agg(
          sum(col("pos") * col("pred")).cast("long").as("tp"),
          sum((lit(1) - col("pos")) * col("pred")).cast("long").as("fp"),
          sum(col("pos") * (lit(1) - col("pred"))).cast("long")
            .as("fn_"),
          sum((lit(1) - col("pos")) * (lit(1) - col("pred")))
            .cast("long").as("tn"))
        .select(col("tp"), col("fp"), col("fn_"), col("tn"),
          expr("CAST(tp * tn - fp * fn_ AS BIGINT)").as("num"),
          expr("CAST(CASE WHEN tp + fp > 0 AND tp + fn_ > 0 " +
            "AND tn + fp > 0 AND tn + fn_ > 0 THEN " +
            "(CASE WHEN tp * tn - fp * fn_ < 0 THEN -1 ELSE 1 END) " +
            "* (CAST(tp * tn - fp * fn_ AS DECIMAL(38,0)) " +
            "* (tp * tn - fp * fn_)) * 1000000 div " +
            "(CAST((tp + fp) AS DECIMAL(38,0)) * (tp + fn_) " +
            "* (tn + fp) * (tn + fn_)) END AS BIGINT)")
            .as("mcc_sq_signed_micro"),
          expr(mcc).as("mcc_micro"))
    },

    // McNemar's paired-classifier test over two cut points of the
    // quality score (the strict 0.5 cut vs the lenient 0.3 cut, both
    // predicting "is-en" for the same documents): accuracy deltas
    // ignore pairing; McNemar reads only the DISCORDANT documents —
    // here exactly the [0.3, 0.5) score band, where the lenient cut
    // says yes and the strict cut says no, so b = negatives in the
    // band (strict right) and c = positives in the band (lenient
    // right) — and tests b vs c. The statistic is the χ² form
    // (b−c)²/(b+c), an exact integer cross-product in micro-units
    // (the srm-gate discipline), SCALE-SAFE where an exact-binomial
    // tail (stats_sign_test's machinery) would overflow: discordant
    // counts grow with the corpus, unlike calendar-bounded series.
    // One tokenize+score pass, one 4-way fold.
    QuerySpec.sql(
      "stats_mcnemar",
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) AS score
         |  FROM q),
         |o AS (
         |  SELECT pos,
         |    CASE WHEN score >= 500000 THEN 1 ELSE 0 END AS pa,
         |    CASE WHEN score >= 300000 THEN 1 ELSE 0 END AS pb
         |  FROM sc),
         |d AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN (pa = pos) AND (pb <> pos)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN (pa <> pos) AND (pb = pos)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM o)
         |SELECT b, c,
         |  CAST(CASE WHEN b + c > 0 THEN
         |    CAST(b - c AS HUGEINT) * (b - c) * 1000000 // (b + c)
         |    END AS BIGINT) AS chi2_micro,
         |  CASE WHEN b + c > 0 THEN
         |    CAST(b - c AS HUGEINT) * (b - c) * 1000000 // (b + c)
         |      > 3841459 ELSE FALSE END AS significant
         |FROM d""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("lang"), split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1).otherwise(0).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CAST((3 * n_stop + 7 * n_distinct) * 1000000 div " +
            "(10 * n_tokens) AS BIGINT)").as("score"))
        .select(col("pos"),
          when(col("score") >= 500000, 1).otherwise(0).as("pa"),
          when(col("score") >= 300000, 1).otherwise(0).as("pb"))
        .agg(
          sum(when(col("pa") === col("pos") && col("pb") =!= col("pos"),
            1L).otherwise(0L)).as("b"),
          sum(when(col("pa") =!= col("pos") && col("pb") === col("pos"),
            1L).otherwise(0L)).as("c"))
        .select(col("b"), col("c"),
          expr("""CAST(CASE WHEN b + c > 0 THEN
            |  CAST(b - c AS DECIMAL(38,0)) * (b - c) * 1000000
            |    div (b + c) END AS BIGINT)""".stripMargin)
            .as("chi2_micro"),
          expr("""CASE WHEN b + c > 0 THEN
            |  CAST(b - c AS DECIMAL(38,0)) * (b - c) * 1000000
            |    div (b + c) > 3841459 ELSE FALSE END""".stripMargin)
            .as("significant"))
    },

    // Duplicated-n-gram mass (the OTHER half of Gopher's repetition
    // filters, Rae et al. 2021 table A1: text_repetition covers the
    // "fraction in the TOP n-gram" family; this one is "fraction of
    // n-gram positions whose n-gram occurs MORE THAN ONCE in the
    // doc" — the signal that catches diffuse boilerplate a single hot
    // n-gram misses, at bigram and trigram width). Exact integer ppm
    // per doc (counts divided once); docs too short for the width
    // emit NULL rather than a fake 0 — both engines agree on the
    // edge. Plan: SHUFFLE-FREE — the duplicated mass comes from the
    // codegen'd [[graft.functions.DupNgramMass]] expression (one O(L)
    // counting pass per doc, the TopNgramCount discipline: the
    // explode+groupBy spelling shuffles every gram occurrence and the
    // sort+neighbor-scan HOF spelling pays interpreted lambda
    // dispatch — measured 1.1 s / 2.0 s vs 0.6 s here at sf0.1). The
    // oracle keeps the explode+groupBy formulation; DupNgramSpec
    // proves value equivalence. Only the output ORDER BY exchanges.
    QuerySpec.sql(
      "text_dup_ngram_mass",
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |bi AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS ng,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(ts)-1)) AS i)
        |      g
        |  WHERE len(ts) >= 2
        |  GROUP BY 1, 2),
        |b2 AS (
        |  SELECT doc_id,
        |    CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0)
        |      AS BIGINT) AS dup_bi,
        |    CAST(SUM(c) AS BIGINT) AS n_bi
        |  FROM bi GROUP BY 1),
        |tri AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |      AS ng,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
        |      g
        |  WHERE len(ts) >= 3
        |  GROUP BY 1, 2),
        |t3 AS (
        |  SELECT doc_id,
        |    CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0)
        |      AS BIGINT) AS dup_tri,
        |    CAST(SUM(c) AS BIGINT) AS n_tri
        |  FROM tri GROUP BY 1),
        |base AS (
        |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM toks)
        |SELECT base.doc_id, base.n_tokens,
        |  CAST(b2.dup_bi * 1000000 // b2.n_bi AS BIGINT)
        |    AS dup_bigram_ppm,
        |  CAST(t3.dup_tri * 1000000 // t3.n_tri AS BIGINT)
        |    AS dup_trigram_ppm
        |FROM base
        |LEFT JOIN b2 ON b2.doc_id = base.doc_id
        |LEFT JOIN t3 ON t3.doc_id = base.doc_id
        |ORDER BY base.doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.DupNgramMass.dup_ngram_mass
      import org.apache.spark.sql.catalyst.expressions.IntegralDivide
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      // exact integer division (the oracle's `//`), not Column `/`
      // (double division — a quotient 1 ulp under an integer would
      // floor wrong)
      def dupPpm(width: Int) = {
        val nGrams = size(col("ts")).cast("long") - (width - 1)
        when(size(col("ts")) >= width,
          column(IntegralDivide(
            expression(dup_ngram_mass(col("ts"), width) * 1000000L),
            expression(nGrams))))
          .cast("long")
      }
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"),
          size(col("ts")).cast("long").as("n_tokens"),
          dupPpm(2).as("dup_bigram_ppm"),
          dupPpm(3).as("dup_trigram_ppm"))
        .orderBy(col("doc_id"))
    },

    // Per-source quality calibration: the raw quality score's
    // percentile WITHIN its source — the normalization that makes a
    // "keep the top X%" cut comparable across domains whose raw score
    // distributions differ (a web crawl and a books corpus don't share
    // a quality scale; per-domain rank does). percent_rank over
    // (quality, doc_id) — the doc_id tie-break makes the rank
    // row-unique, so (rank−1)/(n−1) is the same small rational in both
    // engines and the double hash-compares. The window partitions by
    // SOURCE (balanced domains, bounded partitions) — the acceptable
    // window shape, unlike a global or per-hot-key sort; `keep` is the
    // top-half cut a curation pass would apply.
    QuerySpec.sql(
      "text_quality_calibrated",
      s"""WITH q AS (
         |  SELECT doc_id,
         |    0.3 * (CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))
         |    + 0.7 * (CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*))
         |      AS quality
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |        FROM documents)
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.source, q.quality,
         |  percent_rank() OVER (PARTITION BY d.source
         |    ORDER BY q.quality, d.doc_id) AS pct,
         |  CASE WHEN percent_rank() OVER (PARTITION BY d.source
         |    ORDER BY q.quality, d.doc_id) >= 0.5
         |    THEN 1 ELSE 0 END AS keep
         |FROM q JOIN documents d ON d.doc_id = q.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val q = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN ${inList(langMarkers.head._2)})) AS BIGINT)")
            .as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("doc_id"),
          (lit(0.3) * (col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.7) * (col("n_distinct").cast("double") / col("n_tokens")))
            .as("quality"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality"), col("doc_id"))
      q.join(docs(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
        .withColumn("pct", percent_rank().over(w))
        .withColumn("keep",
          when(col("pct") >= 0.5, lit(1)).otherwise(lit(0)))
        .select(col("doc_id"), col("source"), col("quality"), col("pct"),
          col("keep"))
        .orderBy(col("doc_id"))
    },

    // Language-ID heuristic: per-language stopword-hit ratio, argmax with
    // a fixed preference order (deterministic tie-break).
    QuerySpec.sql(
      "text_lang_id", {
        val scoreCols = langMarkers.map { case (l, ws) =>
          s"""  CAST(SUM(CASE WHEN tok IN ${inList(ws)} THEN 1 ELSE 0 END) AS DOUBLE)
             |    / COUNT(*) AS score_$l""".stripMargin
        }.mkString(",\n")
        val langs = langMarkers.map(_._1)
        val pred = langs.init.zipWithIndex.map { case (l, i) =>
          val rest = langs.drop(i + 1)
          s"WHEN score_$l > 0 AND ${rest.map(r => s"score_$l >= score_$r").mkString(" AND ")} THEN '$l'"
        }.mkString(" ") + s" WHEN score_${langs.last} > 0 THEN '${langs.last}'"
        s"""SELECT doc_id, score_en, score_fr, score_de, score_es, score_zh,
           |  CASE $pred ELSE 'unknown' END AS pred_lang
           |FROM (
           |  SELECT doc_id,
           |$scoreCols
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY doc_id)
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      // shuffle-free: stopword hits per language are per-document array
      // filters over the split tokens (oracle keeps the unnest+groupBy
      // formulation; values identical)
      val scored = docs(s, dir)
        .select(col("doc_id") +: split(col("text"), " ").as("ts") +: Nil: _*)
        .select(col("doc_id") +: size(col("ts")).as("n") +:
          langMarkers.map { case (l, ws) =>
            expr(s"size(filter(ts, t -> t IN ${inList(ws)}))").as(s"hits_$l")
          }: _*)
      val withScores = langMarkers.foldLeft(scored) { case (df, (l, _)) =>
        df.withColumn(s"score_$l", col(s"hits_$l").cast("double") / col("n"))
      }
      val langs = langMarkers.map(_._1)
      val pred = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1)
        s"WHEN score_$l > 0 AND ${rest.map(r => s"score_$l >= score_$r").mkString(" AND ")} THEN '$l'"
      }.mkString(" ") + s" WHEN score_${langs.last} > 0 THEN '${langs.last}'"
      withScores
        .withColumn("pred_lang", expr(s"CASE $pred ELSE 'unknown' END"))
        .select(col("doc_id"), col("score_en"), col("score_fr"), col("score_de"),
          col("score_es"), col("score_zh"), col("pred_lang"))
        .orderBy(col("doc_id"))
    },

    // TextRank keyword extraction — PageRank on the word
    // co-occurrence graph (Mihalcea & Tarau 2004): content words
    // (≥ 4 chars, corpus frequency ≥ 5) are nodes, adjacent-token
    // pairs are undirected edges, 5 damped power-iteration rounds in
    // the same integer mass as graph_pagerank (teleport +
    // floor(0.85·Σ floor(rank/deg)) — no float accumulation, so
    // partitioning cannot change a single rank). Top 20 by rank are
    // the corpus keywords. Per round: one shuffle join on the word
    // key + one hash aggregate; the oracle unrolls the same ladder.
    QuerySpec.sql(
      "text_textrank_keywords", {
        val iters = 5
        def step(prev: String) =
          s"""SELECT n.w,
             |  CAST(150000000000 AS BIGINT)
             |    + CAST(FLOOR(CAST(0.85 AS DOUBLE)
             |      * CAST(COALESCE(SUM(
             |          CAST(FLOOR(CAST(r.rank AS DOUBLE) / dg.d)
             |            AS BIGINT)), 0) AS DOUBLE)) AS BIGINT) AS rank
             |FROM vocab n
             |LEFT JOIN sym e ON e.v = n.w
             |LEFT JOIN $prev r ON r.w = e.u
             |LEFT JOIN deg dg ON dg.w = e.u
             |GROUP BY n.w""".stripMargin
        val ladder = (1 to iters)
          .map(i => s"r$i AS (${step(s"r${i - 1}")})").mkString(",\n")
        s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
           |  FROM documents),
           |adj AS (
           |  SELECT ts[i] AS a, ts[i+1] AS b
           |  FROM toks,
           |    LATERAL (SELECT unnest(generate_series(1, len(ts)-1)) AS i) g
           |  WHERE len(ts) >= 2),
           |vocab AS (
           |  SELECT tok AS w FROM (
           |    SELECT unnest(string_split(text, ' ')) AS tok
           |    FROM documents) t
           |  WHERE length(tok) >= 4
           |  GROUP BY 1 HAVING COUNT(*) >= 5),
           |eg AS (
           |  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
           |  FROM adj
           |  WHERE a <> b
           |    AND a IN (SELECT w FROM vocab)
           |    AND b IN (SELECT w FROM vocab)),
           |sym AS (SELECT u, v FROM eg
           |  UNION ALL SELECT d2.v AS u, d2.u AS v FROM eg d2),
           |deg AS (SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS d
           |  FROM sym GROUP BY 1),
           |r0 AS (SELECT w, CAST(1000000000000 AS BIGINT) AS rank
           |  FROM vocab),
           |$ladder
           |SELECT w AS keyword, rank FROM r$iters
           |ORDER BY rank DESC, keyword LIMIT 20""".stripMargin
      }) { (s, dir) =>
      val iters = 5
      val toks = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val adj = toks.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ts) - 1),
            |  i -> struct(element_at(ts, i) AS a,
            |              element_at(ts, i + 1) AS b))""".stripMargin))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val vocab = toks
        .select(explode(col("ts")).as("tok"))
        .filter(length(col("tok")) >= 4)
        .groupBy(col("tok").as("w"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 5)
        .select(col("w"))
      val eg = adj.filter(col("a") =!= col("b"))
        .join(vocab.withColumnRenamed("w", "a"), Seq("a"))
        .join(vocab.withColumnRenamed("w", "b"), Seq("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
      val sym = Materialize.stable(eg.unionByName(
        eg.select(col("v").as("u"), col("u").as("v"))))
      val deg = sym.groupBy(col("u").as("w")).agg(count(lit(1)).as("d"))
      val nodes = Materialize.stable(vocab)
      var ranks = nodes.withColumn("rank", lit(1000000000000L))
      for (_ <- 1 to iters) {
        val contrib = sym.select(col("u").as("w"), col("v"))
          .join(ranks, Seq("w")).join(deg, Seq("w"))
          .select(col("v").as("w"),
            floor(col("rank").cast("double") / col("d")).cast("long")
              .as("c"))
          .groupBy(col("w")).agg(sum(col("c")).as("sc"))
        // rounds chain in one tree (r16): fixed 5-round ladder — the
        // per-round eager checkpoint cost 5 jobs per construction;
        // sym/nodes stay stable'd (the inputs every round re-reads)
        ranks = nodes.join(contrib, Seq("w"), "left")
          .select(col("w"),
            (lit(150000000000L) +
              floor(lit(0.85) *
                coalesce(col("sc"), lit(0L)).cast("double"))
                .cast("long")).as("rank"))
      }
      ranks.orderBy(col("rank").desc, col("w"))
        .limit(20)
        .select(col("w").as("keyword"), col("rank"))
    },

    // Language-ID CONFUSION MATRIX — the classifier eval: the n-gram
    // heuristic's predictions against the corpus's labeled `lang`,
    // with per-(actual, predicted) counts and row-normalized recall
    // in exact ppm. The matrix is how a curation run decides whether
    // the cheap heuristic is good enough to gate on — the same
    // shuffle-free per-doc scoring as text_lang_id, then one
    // class-grain aggregate pair.
    QuerySpec.sql(
      "text_lang_confusion", {
        val scoreCols = langMarkers.map { case (l, ws) =>
          s"""  CAST(SUM(CASE WHEN tok IN ${inList(ws)} THEN 1 ELSE 0 END) AS DOUBLE)
             |    / COUNT(*) AS score_$l""".stripMargin
        }.mkString(",\n")
        val langs = langMarkers.map(_._1)
        val pred = langs.init.zipWithIndex.map { case (l, i) =>
          val rest = langs.drop(i + 1)
          s"WHEN score_$l > 0 AND ${rest.map(r => s"score_$l >= score_$r").mkString(" AND ")} THEN '$l'"
        }.mkString(" ") + s" WHEN score_${langs.last} > 0 THEN '${langs.last}'"
        s"""WITH sc AS (
           |  SELECT doc_id, lang,
           |$scoreCols
           |  FROM (SELECT doc_id, lang,
           |      unnest(string_split(text, ' ')) AS tok
           |    FROM documents)
           |  GROUP BY doc_id, lang),
           |p AS (SELECT lang,
           |    CASE $pred ELSE 'unknown' END AS pred_lang
           |  FROM sc),
           |c AS (SELECT lang, pred_lang,
           |    CAST(COUNT(*) AS BIGINT) AS n_docs
           |  FROM p GROUP BY 1, 2),
           |t AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS tot
           |  FROM c GROUP BY 1)
           |SELECT c.lang AS actual_lang, c.pred_lang, c.n_docs,
           |  CAST(c.n_docs * 1000000 // t.tot AS BIGINT) AS recall_ppm
           |FROM c JOIN t USING (lang)
           |ORDER BY actual_lang, pred_lang""".stripMargin
      }) { (s, dir) =>
      val scored = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("ts"))
        .select(col("doc_id") +: col("lang") +: size(col("ts")).as("n") +:
          langMarkers.map { case (l, ws) =>
            expr(s"size(filter(ts, t -> t IN ${inList(ws)}))").as(s"hits_$l")
          }: _*)
      val withScores = langMarkers.foldLeft(scored) { case (df, (l, _)) =>
        df.withColumn(s"score_$l",
          col(s"hits_$l").cast("double") / col("n"))
      }
      val langs = langMarkers.map(_._1)
      val pred = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1)
        s"WHEN score_$l > 0 AND ${rest.map(r => s"score_$l >= score_$r").mkString(" AND ")} THEN '$l'"
      }.mkString(" ") + s" WHEN score_${langs.last} > 0 THEN '${langs.last}'"
      val c = withScores
        .withColumn("pred_lang", expr(s"CASE $pred ELSE 'unknown' END"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
      val t = c.groupBy(col("lang")).agg(sum(col("n_docs")).as("tot"))
      c.join(t, Seq("lang"))
        .select(col("lang").as("actual_lang"), col("pred_lang"),
          col("n_docs"),
          expr("CAST(n_docs * 1000000 div tot AS BIGINT)")
            .as("recall_ppm"))
        .orderBy(col("actual_lang"), col("pred_lang"))
    },

    // Document fingerprinting: full-content hash + short prefix (the
    // reference's rowkey-prefix idiom, topology.js:99-109) + length.
    QuerySpec.sql(
      "text_fingerprint",
      """SELECT doc_id, md5(lower(text)) AS fp,
        |  substr(md5(lower(text)), 1, 8) AS fp_prefix,
        |  length(text) AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), md5(lower(col("text"))).as("fp"),
          substring(md5(lower(col("text"))), 1, 8).as("fp_prefix"),
          length(col("text")).as("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Winnowing fingerprint (the rolling-hash document fingerprint of
    // the MOSS scheme): hash every k-gram, slide a w-window over the
    // hash sequence, keep each window's minimum — the selected set is
    // the document's fingerprint. Near-dup docs share most selected
    // hashes. Expressed with array higher-order functions per document
    // (no explode, no shuffle); the digest column makes the set a
    // sortable scalar.
    QuerySpec.sql(
      "text_winnow", {
        val k = 8; val w = 4
        s"""SELECT doc_id,
           |  len(fp) AS n_fingerprints,
           |  md5(array_to_string(fp, '')) AS fp_digest
           |FROM (
           |  SELECT doc_id,
           |    list_sort(list_distinct(list_transform(
           |      generate_series(1, len(hashes) - ${w - 1}),
           |      j -> list_aggregate(hashes[j:j+${w - 1}], 'min')))) AS fp
           |  FROM (
           |    SELECT doc_id,
           |      list_transform(generate_series(1, length(text) - ${k - 1}),
           |        i -> md5(substr(text, i, $k))) AS hashes
           |    FROM documents
           |    WHERE length(text) >= ${k + w - 1}))
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      // fingerprint via the codegen'd WinnowFp expression — one tight
      // pass per document (monotonic-deque sliding min) with values
      // identical to the declarative transform/slice/array_min plan
      // the oracle keeps (equivalence spec: WinnowSpec); the cached
      // fingerprint frame is shared with dedup_winnow_pairs
      winnowFps(s, dir)
        .select(col("doc_id"),
          size(col("fp")).cast("long").as("n_fingerprints"),
          md5(concat_ws("", col("fp"))).as("fp_digest"))
        .orderBy(col("doc_id"))
    },

    // J7: prefix join — resolve entities by shared key prefix (topology
    // pubkey-prefix resolution, topology.js:99-109): part pairs sharing
    // the first name word, aggregated per prefix.
    QuerySpec.sql(
      "j7_prefix_join",
      """SELECT prefix, COUNT(*) AS n_pairs
        |FROM (
        |  SELECT a.prefix AS prefix
        |  FROM (SELECT p_partkey, string_split(p_name, ' ')[1] AS prefix FROM part) a
        |  JOIN (SELECT p_partkey, string_split(p_name, ' ')[1] AS prefix FROM part) b
        |  ON a.prefix = b.prefix AND a.p_partkey < b.p_partkey)
        |GROUP BY prefix
        |ORDER BY prefix""".stripMargin) { (s, dir) =>
      // Oracle keeps the self-join formulation; the Spark plan avoids the
      // quadratic join entirely — the pair count per prefix is just
      // C(n, 2) = n*(n-1)/2 over a plain group count (one hash-agg, no
      // join, linear in the hottest prefix instead of quadratic).
      Tables(s, dir, "part")
        .select(expr("element_at(split(p_name, ' '), 1)").as("prefix"))
        .groupBy(col("prefix"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 2)
        .select(col("prefix"),
          (col("n") * (col("n") - 1) / 2).cast("long").as("n_pairs"))
        .orderBy(col("prefix"))
    },

    // Heavy hitters: global top-20 tokens by total frequency — the
    // vocabulary/stop-list discovery pass a corpus pipeline runs first.
    // Shape: explode → hash-agg (map-side partial combine collapses
    // each partition to its distinct tokens before the shuffle) →
    // TakeOrderedAndProject top-k. The df column rides along via
    // count(distinct), planned as a two-phase expand-agg — still
    // shuffle-on-token, no windows.
    QuerySpec.sql(
      "text_heavy_hitters",
      """SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY tok
        |ORDER BY tf DESC, tok LIMIT 20""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("tok"))
        .limit(20)
    },

    // Count-min sketch (d=4 rows × w=256 counters): the FIXED-size
    // mergeable frequency sketch — counter state is 1 024 longs at ANY
    // vocabulary size, merge = elementwise addition, so partial
    // sketches combine map-side and across corpus shards/streams (the
    // shape exact per-token counts cannot have: their state is the
    // vocabulary itself). est(t) = min over rows of counter[i][h_i(t)]
    // — never under the true count, over by at most ~N/w per row.
    // Plan: token explode → ONE md5 digest per occurrence, the d=4
    // row hashes read staggered 13-hex-char windows of that single
    // digest (offset 4i — the derived-multi-hash trick of
    // Kirsch–Mitzenmacher double hashing: one strong digest funds all
    // rows, quartering the dominant map-side CPU) → ONE hash
    // aggregate with 1 024 groups (map-side combine collapses each
    // partition to the counter matrix before the shuffle — cheaper
    // than the exact vocabulary shuffle the heavy-hitters pass pays);
    // estimates for the exact top-20 via a broadcast join against the
    // tiny counter table. Deterministic end to end (md5-derived rows,
    // integer counts), so the ESTIMATE hash-compares; within_bound
    // self-measures overcount·w ≤ 2N (generous vs the E[over] = N/w
    // per-row expectation, min over 4 rows).
    QuerySpec.sql(
      "sketch_cms_topk",
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |rows_ AS (SELECT unnest(range(0, $CmsDepth)) AS i),
         |keyed AS (
         |  SELECT i,
         |    CAST(('0x' || substr(md5(tok), 1 + 4 * i, 13)) AS BIGINT)
         |      % $CmsWidth AS j
         |  FROM toks CROSS JOIN rows_),
         |counters AS (
         |  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM keyed GROUP BY 1, 2),
         |total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks),
         |top AS (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY tok ORDER BY tf DESC, tok LIMIT 20),
         |est AS (
         |  SELECT t.tok, t.tf, MIN(c.cnt) AS cms_est
         |  FROM top t CROSS JOIN rows_ r
         |  JOIN counters c ON c.i = r.i AND c.j =
         |    CAST(('0x' || substr(md5(t.tok), 1 + 4 * r.i, 13)) AS BIGINT)
         |      % $CmsWidth
         |  GROUP BY 1, 2)
         |SELECT tok, tf, cms_est, cms_est - tf AS overcount,
         |  cms_est >= tf AND (cms_est - tf) * $CmsWidth <= 2 * n_total
         |    AS within_bound
         |FROM est CROSS JOIN total
         |ORDER BY tf DESC, tok""".stripMargin) { (s, dir) =>
      // row i's slot from the SHARED digest column (static offsets —
      // stays in whole-stage codegen)
      def slot(h: org.apache.spark.sql.Column, i: Int) =
        pmod(conv(substring(h, 1 + 4 * i, 13), 16, 10).cast("long"),
          lit(CmsWidth.toLong))
      def slots(h: org.apache.spark.sql.Column) =
        posexplode(array((0 until CmsDepth).map(i => slot(h, i)): _*))
      val toks = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
      val counters = toks
        .withColumn("h", md5(col("tok")))
        .select(slots(col("h")).as(Seq("i", "j")))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("cnt"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("tok")).limit(20)
      top
        .withColumn("h", md5(col("tok")))
        .select(col("tok"), col("tf"), slots(col("h")).as(Seq("i", "j")))
        .join(broadcast(counters), Seq("i", "j"))
        .groupBy(col("tok"), col("tf"))
        .agg(min(col("cnt")).as("cms_est"))
        .crossJoin(broadcast(total))
        .select(col("tok"), col("tf"), col("cms_est"),
          (col("cms_est") - col("tf")).as("overcount"),
          (col("cms_est") >= col("tf") &&
            (col("cms_est") - col("tf")) * lit(CmsWidth.toLong) <=
              lit(2L) * col("n_total")).as("within_bound"))
        .orderBy(col("tf").desc, col("tok"))
    },

    // Simpson diversity — the collision-probability view of lexical
    // diversity beside the entropy rate: D = Σc(c−1)/(N(N−1)) is the
    // chance two random tokens coincide (an EXACT rational, unlike
    // entropy's logs), and 1/D the effective vocabulary. Emitted per
    // source as integer ppm plus the effective-vocab floor — one
    // count-table pass, no floats at all.
    QuerySpec.sql(
      "text_simpson_diversity",
      """WITH cnt AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(c * (c - 1)) AS BIGINT) AS coll
        |  FROM cnt GROUP BY 1)
        |SELECT source, n AS n_tokens, k AS n_distinct,
        |  CAST(CASE WHEN n > 1 THEN coll * 1000000 // (n * (n - 1)) END
        |    AS BIGINT) AS simpson_ppm,
        |  CAST(CASE WHEN coll > 0 THEN n * (n - 1) // coll END
        |    AS BIGINT) AS effective_vocab
        |FROM a ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).cast("long").as("n"),
          count(lit(1)).as("k"),
          sum(col("c") * (col("c") - 1)).cast("long").as("coll"))
        .select(col("source"), col("n").as("n_tokens"),
          col("k").as("n_distinct"),
          expr("CAST(CASE WHEN n > 1 THEN coll * 1000000 " +
            "div (n * (n - 1)) END AS BIGINT)").as("simpson_ppm"),
          expr("CAST(CASE WHEN coll > 0 THEN n * (n - 1) div coll END " +
            "AS BIGINT)").as("effective_vocab"))
        .orderBy(col("source"))
    },

    // Corpus entropy rate — the information-theoretic summary the LM
    // gates don't give: unigram entropy H(w), bigram entropy H(w₁w₂),
    // and the conditional entropy rate H(w₂|w₁) = H(w₁w₂) − H(w₁) —
    // how much a next-token model can even hope to compress. Each
    // entropy is H = ln(N) − Σc·ln(c)/N over exact count tables with
    // every ln micro-quantized through the shared expression (the
    // feat_mutual_info discipline), so all three numbers are exact
    // integer micro-nats. One tokenize pass feeds both grains.
    QuerySpec.sql(
      "text_entropy_rate", {
        def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
          s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH toks AS (
           |  SELECT doc_id, i,
           |    ts[i] AS w1, CASE WHEN i < len(ts) THEN ts[i+1] END AS w2
           |  FROM (SELECT doc_id, string_split(text, ' ') AS ts
           |    FROM documents) d,
           |    LATERAL (SELECT unnest(generate_series(1, len(ts)))
           |      AS i) g),
           |uni AS (SELECT w1 AS k, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM toks GROUP BY 1),
           |big AS (SELECT w1 || ' ' || w2 AS k,
           |    CAST(COUNT(*) AS BIGINT) AS c
           |  FROM toks WHERE w2 IS NOT NULL GROUP BY 1),
           |hu AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
           |    CAST(COUNT(*) AS BIGINT) AS k,
           |    CAST(SUM(c * ${lnm("c")}) AS BIGINT) AS s
           |  FROM uni),
           |hb AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
           |    CAST(COUNT(*) AS BIGINT) AS k,
           |    CAST(SUM(c * ${lnm("c")}) AS BIGINT) AS s
           |  FROM big)
           |SELECT hu.n AS n_tokens, hu.k AS n_unigrams,
           |  hb.k AS n_bigrams,
           |  CAST(${lnm("hu.n")} - hu.s // hu.n AS BIGINT)
           |    AS h_unigram_micro,
           |  CAST(${lnm("hb.n")} - hb.s // hb.n AS BIGINT)
           |    AS h_bigram_micro,
           |  CAST((${lnm("hb.n")} - hb.s // hb.n)
           |    - (${lnm("hu.n")} - hu.s // hu.n) AS BIGINT)
           |    AS h_cond_micro
           |FROM hu, hb""".stripMargin
      }) { (s, dir) =>
      def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
        s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      def hFold(cells: DataFrame) = cells
        .agg(sum(col("c")).cast("long").as("n"),
          count(lit(1)).as("k"),
          sum(col("c") * expr(lnm("c"))).cast("long").as("s"))
      val ts = docs(s, dir)
        .select(split(col("text"), " ").as("ts"))
      val uni = ts.select(explode(col("ts")).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
      val big = ts.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ts) - 1),
            |  i -> concat(element_at(ts, i), ' ',
            |    element_at(ts, i + 1)))""".stripMargin)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
      hFold(uni).select(col("n").as("n_tokens"),
          col("k").as("n_unigrams"),
          expr(s"CAST(${lnm("n")} - s div n AS BIGINT)").as("hu"))
        .crossJoin(broadcast(hFold(big)
          .select(col("k").as("n_bigrams"),
            expr(s"CAST(${lnm("n")} - s div n AS BIGINT)").as("hb"))))
        .select(col("n_tokens"), col("n_unigrams"), col("n_bigrams"),
          col("hu").as("h_unigram_micro"),
          col("hb").as("h_bigram_micro"),
          (col("hb") - col("hu")).as("h_cond_micro"))
    },

    // CMS width SWEEP — the sketch-sizing curve (the probe-sweep /
    // threshold-sweep discipline applied to the frequency sketch):
    // how does the top-20 overcount decay as the counter row widens
    // 64 → 256 → 1024? Keyed on word BIGRAMS (~|vocab|² keys — the
    // unigram vocabulary is too small to ever collide) with the same
    // Kirsch–Mitzenmacher derived hashes. ONE corpus pass folds the
    // exact bigram counts (vocabulary-bounded); the (width, row) grid
    // then explodes over that COUNTED key table — 12 rows per
    // DISTINCT key, never per occurrence — and counters are
    // weight-sums. Exact integers throughout: total/max overcount
    // over the true top-20 and how many clear the 2N/w bound — the
    // number an operator reads before provisioning sketch memory.
    QuerySpec.sql(
      "sketch_cms_sweep", {
        val widths = Seq(64, 256, 1024)
        s"""WITH bi AS (
           |  SELECT ts[i] || ' ' || ts[i+1] AS k
           |  FROM (SELECT string_split(text, ' ') AS ts FROM documents) d,
           |    LATERAL (SELECT unnest(generate_series(1, len(ts)-1))
           |      AS i) g
           |  WHERE len(ts) >= 2),
           |keys AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM bi GROUP BY 1),
           |grid AS (
           |  SELECT w, i FROM (SELECT UNNEST([${widths.mkString(", ")}])
           |    AS w) ws, (SELECT unnest(range(0, $CmsDepth)) AS i) rs),
           |counters AS (
           |  SELECT g.w, g.i,
           |    CAST(('0x' || substr(md5(k), 1 + 4 * g.i, 13)) AS BIGINT)
           |      % g.w AS j,
           |    CAST(SUM(tf) AS BIGINT) AS cnt
           |  FROM keys CROSS JOIN grid g GROUP BY 1, 2, 3),
           |total AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_total
           |  FROM keys),
           |top AS (SELECT k, tf FROM keys
           |  ORDER BY tf DESC, k LIMIT 20),
           |est AS (
           |  SELECT g.w, t.k, t.tf, MIN(c.cnt) AS cms_est
           |  FROM top t CROSS JOIN grid g
           |  JOIN counters c ON c.w = g.w AND c.i = g.i AND c.j =
           |    CAST(('0x' || substr(md5(t.k), 1 + 4 * g.i, 13))
           |      AS BIGINT) % g.w
           |  GROUP BY 1, 2, 3)
           |SELECT CAST(w AS INT) AS width,
           |  CAST($CmsDepth * w AS BIGINT) AS n_counters,
           |  CAST(SUM(cms_est - tf) AS BIGINT) AS sum_overcount,
           |  CAST(MAX(cms_est - tf) AS BIGINT) AS max_overcount,
           |  CAST(COALESCE(SUM(CASE WHEN (cms_est - tf) * w
           |    <= 2 * n_total THEN 1 END), 0) AS BIGINT) AS n_within
           |FROM est CROSS JOIN total
           |GROUP BY w ORDER BY width""".stripMargin
      }) { (s, dir) =>
      val widths = Seq(64, 256, 1024)
      def slot(h: org.apache.spark.sql.Column, i: Int, w: Int) =
        pmod(conv(substring(h, 1 + 4 * i, 13), 16, 10).cast("long"),
          lit(w.toLong))
      def slots(h: org.apache.spark.sql.Column) =
        explode(array((for (w <- widths; i <- 0 until CmsDepth)
          yield struct(lit(w).as("w"), lit(i).as("i"),
            slot(h, i, w).as("j"))): _*))
      val keys = docs(s, dir)
        .select(split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ts) - 1),
            |  i -> concat(element_at(ts, i), ' ',
            |    element_at(ts, i + 1)))""".stripMargin)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("tf"))
      val keysM = Materialize.stable(keys)
      val counters = keysM
        .withColumn("h", md5(col("k")))
        .select(col("tf"), slots(col("h")).as("s"))
        .select(col("tf"), col("s.w").as("w"), col("s.i").as("i"),
          col("s.j").as("j"))
        .groupBy(col("w"), col("i"), col("j"))
        .agg(sum(col("tf")).cast("long").as("cnt"))
      val total = keysM.agg(sum(col("tf")).cast("long").as("n_total"))
      val top = keysM.orderBy(col("tf").desc, col("k")).limit(20)
      top
        .withColumn("h", md5(col("k")))
        .select(col("k"), col("tf"), slots(col("h")).as("s"))
        .select(col("k"), col("tf"), col("s.w").as("w"),
          col("s.i").as("i"), col("s.j").as("j"))
        .join(broadcast(counters), Seq("w", "i", "j"))
        .groupBy(col("w"), col("k"), col("tf"))
        .agg(min(col("cnt")).as("cms_est"))
        .crossJoin(broadcast(total))
        .groupBy(col("w").cast("int").as("width"))
        .agg(first(lit(CmsDepth)).as("__d"),
          sum(col("cms_est") - col("tf")).cast("long")
            .as("sum_overcount"),
          max(col("cms_est") - col("tf")).cast("long")
            .as("max_overcount"),
          coalesce(sum(when((col("cms_est") - col("tf")) * col("w")
            <= lit(2L) * col("n_total"), 1L)), lit(0L))
            .as("n_within"))
        .select(col("width"),
          (col("__d") * col("width")).cast("long").as("n_counters"),
          col("sum_overcount"), col("max_overcount"), col("n_within"))
        .orderBy(col("width"))
    },

    // Per-document salient terms: top-3 tokens by tf/df — the
    // idf-proportional relevance ranking (monotone in tf·(1/df); the
    // log is dropped so the score is ONE correctly-rounded IEEE
    // division and both engines agree bit-for-bit — ln() across
    // libm implementations does not). Two hash-aggs (doc-term, then
    // term) + a shuffle join on token; per-doc ranking goes through
    // the custom [[graft.plans.TopKPerKey]] plan (map-side heap
    // reduce — the window spelling would shuffle and sort EVERY
    // scored (doc, term) pair to keep 3 per doc).
    QuerySpec.sql(
      "text_tfidf_topk",
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |scored AS (
        |  SELECT doc_id, tf.tok AS tok, tf, df,
        |    CAST(tf AS DOUBLE) / df AS score
        |  FROM tf JOIN df ON tf.tok = df.tok)
        |SELECT doc_id, tok, tf, df, score, rnk FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin) { (s, dir) =>
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val scored = tf.join(df, Seq("tok"))
        .withColumn("score", col("tf").cast("double") / col("df"))
        .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score"))
      graft.plans.TopKPerKey.topKRanked(scored, Seq("doc_id"),
          Seq("score" -> true, "tok" -> false), 3, "rnk")
        .select(col("doc_id"), col("tok"), col("tf"), col("df"),
          col("score"), col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    },

    // Sentence segmentation: split on terminal punctuation followed by
    // a space (the same literal-class regex in both engines — kept
    // deliberately simple so the two regex dialects cannot diverge),
    // with per-document sentence stats. Pure per-row array math, no
    // shuffle beyond the output sort.
    QuerySpec.sql(
      "text_sentences",
      """SELECT doc_id,
        |  CAST(len(ss) AS BIGINT) AS n_sentences,
        |  CAST(length(ss[1]) AS BIGINT) AS first_len,
        |  CAST(length(ss[len(ss)]) AS BIGINT) AS last_len,
        |  md5(array_to_string(ss, '')) AS seg_digest
        |FROM (SELECT doc_id,
        |    string_split_regex(text, '[.!?] ') AS ss
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), "[.!?] ").as("ss"))
        .select(col("doc_id"),
          size(col("ss")).cast("long").as("n_sentences"),
          length(element_at(col("ss"), 1)).cast("long").as("first_len"),
          length(element_at(col("ss"), -1)).cast("long").as("last_len"),
          md5(concat_ws("", col("ss"))).as("seg_digest"))
        .orderBy(col("doc_id"))
    },

    // Fixed-window chunking with overlap: 64-token chunks on a
    // 48-token stride (16-token overlap) — the doc→context-window
    // split that feeds tokenization. Pure per-row 1→N flatMap
    // (explode of a stride sequence), no shuffle; the fingerprint
    // proves the chunk CONTENT, not just its offsets.
    QuerySpec.sql(
      "text_chunk",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents)
        |SELECT doc_id, CAST((i - 1) // 48 AS INT) AS chunk_id,
        |  CAST(i AS INT) AS tok_start,
        |  CAST(LEAST(i + 63, len(ts)) AS INT) AS tok_end,
        |  md5(array_to_string(ts[i:LEAST(i + 63, len(ts))], ' ')) AS chunk_fp
        |FROM toks,
        |  LATERAL (SELECT unnest(generate_series(1, GREATEST(len(ts), 1), 48))
        |    AS i) g
        |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"), col("ts"),
          explode(expr("sequence(1, greatest(size(ts), 1), 48)")).as("i"))
        .select(col("doc_id"),
          expr("CAST((i - 1) div 48 AS INT)").as("chunk_id"),
          col("i").cast("int").as("tok_start"),
          least(col("i") + 63, size(col("ts"))).cast("int").as("tok_end"),
          md5(expr("array_join(slice(ts, i, 64), ' ')")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // Bigram collocation strength (PMI): how much more often two
    // adjacent tokens co-occur than independence predicts. The log is
    // dropped (monotone), leaving pmi_ratio =
    //   (c_xy * N_uni^2) / (c_x * c_y * N_big)
    // — both operands are exact integer products < 2^53, so the single
    // IEEE division is identical in both engines. Plan: one explode +
    // hash-agg per granularity (bigram / unigram / two scalar totals);
    // unigram counts join back onto the bigram counts by token key —
    // hot stopword keys skew the build side rows, not the hash-join
    // partitioning, and the c_xy >= 5 support filter prunes the long
    // tail before the joins.
    QuerySpec.sql(
      "text_collocation_pmi",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |uni AS (SELECT unnest(ts) AS tok FROM toks),
        |ucnt AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY 1),
        |nu AS (SELECT COUNT(*) AS n_uni FROM uni),
        |big AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)),
        |bcnt AS (SELECT w1, w2, COUNT(*) AS c_xy FROM big GROUP BY 1, 2),
        |nb AS (SELECT COUNT(*) AS n_big FROM big)
        |SELECT w1, w2, c_xy,
        |  (CAST(c_xy AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE))
        |    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)
        |       * CAST(n_big AS DOUBLE)) AS pmi_ratio
        |FROM bcnt
        |JOIN ucnt u1 ON u1.tok = bcnt.w1
        |JOIN ucnt u2 ON u2.tok = bcnt.w2
        |CROSS JOIN nu CROSS JOIN nb
        |WHERE c_xy >= 5
        |ORDER BY pmi_ratio DESC, w1, w2
        |LIMIT 50""".stripMargin) { (s, dir) =>
      val toks = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val uni = toks.select(explode(col("ts")).as("tok"))
      val ucnt = uni.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val nUni = uni.agg(count(lit(1)).as("n_uni"))
      val big = toks.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))"))
          .as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val bcnt = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
      val nBig = big.agg(count(lit(1)).as("n_big"))
      bcnt
        .join(ucnt.select(col("tok").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(ucnt.select(col("tok").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBig))
        .select(col("w1"), col("w2"), col("c_xy"),
          ((col("c_xy").cast("double") * col("n_uni").cast("double") *
            col("n_uni").cast("double")) /
            (col("c1").cast("double") * col("c2").cast("double") *
              col("n_big").cast("double"))).as("pmi_ratio"))
        .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
        .limit(50)
    },

    // Unigram language-model quality score (the CCNet-style perplexity
    // filter): train an add-one-smoothed unigram LM on the corpus
    // itself, score each document by its mean negative log-likelihood
    // per token — low avg_nll ≈ fluent/common text, high ≈ noise. The
    // log-prob of each vocabulary word is rounded to 6 decimals and
    // carried as integer micros, so per-document sums are exact long
    // arithmetic (order-independent, engine-independent); the single
    // double division at the end runs on identical operands in both
    // engines. Token→log-prob is a SALTED join ([[graft.functions
    // .Skew]]): token frequency is zipfian, so the hot words ("the")
    // would otherwise pile every occurrence row onto one reducer at
    // 100 TB — the salt spreads each word over 8 sub-partitions while
    // the one-row-per-word LM side replicates 8×. The (doc_id, tok)
    // pre-aggregation both shrinks the probe side and makes the
    // per-doc sum a weighted fold.
    QuerySpec.sql(
      "text_lm_score",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |pd AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1, 2),
        |vocab AS (
        |  SELECT tok, CAST(SUM(cnt) AS BIGINT) AS c FROM pd GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n_total,
        |    CAST(COUNT(*) AS BIGINT) AS v_size
        |  FROM vocab),
        |lp AS (
        |  SELECT tok,
        |    CAST(CAST(ln(CAST(c + 1 AS DOUBLE)
        |        / CAST(n_total + v_size AS DOUBLE)) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS lp_micros
        |  FROM vocab CROSS JOIN tot)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |  CAST(-SUM(cnt * lp_micros) AS DOUBLE)
        |    / CAST(SUM(cnt) * 1000000 AS DOUBLE) AS avg_nll
        |FROM pd JOIN lp USING (tok)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val perDoc = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
      val vocab = perDoc.groupBy(col("tok")).agg(sum(col("cnt")).as("c"))
      val tot = vocab.agg(sum(col("c")).as("n_total"),
        count(lit(1)).as("v_size"))
      val lp = vocab.crossJoin(broadcast(tot))
        .select(col("tok"),
          graft.functions.Cols.micros6(
            log((col("c") + 1).cast("double") /
              (col("n_total") + col("v_size")).cast("double")))
            .as("lp_micros"))
      graft.functions.Skew.saltedJoin(perDoc, lp, Seq("tok"), factor = 8)
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"),
          sum(col("cnt") * col("lp_micros")).as("sm"))
        .select(col("doc_id"), col("n_tokens"),
          ((-col("sm")).cast("double") /
            (col("n_tokens") * lit(1000000L)).cast("double")).as("avg_nll"))
        .orderBy(col("doc_id"))
    },

    // Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1
    // adapted to the synthetic corpus): four deterministic per-document
    // rules — word-count bounds, mean-word-length bounds, vocabulary
    // diversity (repetition proxy), minimum stopword evidence — each
    // emitted as a 0/1 flag plus the combined keep decision and the
    // FIRST failing rule as the reject reason (the audit trail a
    // curation pipeline stores next to every dropped document). All
    // four rules are per-document array folds over the split tokens:
    // zero shuffle, one codegen stage, embarrassingly parallel at any
    // corpus size.
    QuerySpec.sql(
      "text_gopher_rules", {
        val stops = inList(langMarkers.head._2)
        s"""WITH m AS (
           |  SELECT doc_id,
           |    len(ws) AS n_words,
           |    CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
           |      / len(ws) AS mean_word_len,
           |    CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
           |      AS distinct_ratio,
           |    CAST(len(list_filter(ws, w -> w IN $stops)) AS BIGINT)
           |      AS n_stop
           |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
           |        FROM documents)),
           |r AS (
           |  SELECT *,
           |    CASE WHEN n_words BETWEEN 20 AND 90 THEN 1 ELSE 0 END
           |      AS r_word_count,
           |    CASE WHEN mean_word_len >= 3.8 AND mean_word_len <= 5.2
           |      THEN 1 ELSE 0 END AS r_word_len,
           |    CASE WHEN distinct_ratio >= 0.4 THEN 1 ELSE 0 END
           |      AS r_diversity,
           |    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stopword
           |  FROM m)
           |SELECT doc_id, n_words, mean_word_len, distinct_ratio, n_stop,
           |  r_word_count, r_word_len, r_diversity, r_stopword,
           |  r_word_count * r_word_len * r_diversity * r_stopword AS keep,
           |  CASE WHEN r_word_count = 0 THEN 'word_count'
           |       WHEN r_word_len = 0 THEN 'word_len'
           |       WHEN r_diversity = 0 THEN 'diversity'
           |       WHEN r_stopword = 0 THEN 'stopword'
           |       ELSE '' END AS reject_reason
           |FROM r
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val stops = inList(langMarkers.head._2)
      val m = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          expr("CAST(aggregate(ws, 0, (a, w) -> a + length(w)) AS DOUBLE)")
            .as("sum_len"),
          size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
          expr(s"CAST(size(filter(ws, w -> w IN $stops)) AS BIGINT)")
            .as("n_stop"))
        .select(col("doc_id"), col("n_words"),
          (col("sum_len") / col("n_words")).as("mean_word_len"),
          (col("n_distinct").cast("double") / col("n_words"))
            .as("distinct_ratio"),
          col("n_stop"))
      val r = m
        .withColumn("r_word_count",
          when(col("n_words").between(20, 90), 1).otherwise(0))
        .withColumn("r_word_len",
          when(col("mean_word_len") >= 3.8 && col("mean_word_len") <= 5.2, 1)
            .otherwise(0))
        .withColumn("r_diversity",
          when(col("distinct_ratio") >= 0.4, 1).otherwise(0))
        .withColumn("r_stopword",
          when(col("n_stop") >= 2, 1).otherwise(0))
      r.withColumn("keep",
          col("r_word_count") * col("r_word_len") *
            col("r_diversity") * col("r_stopword"))
        .withColumn("reject_reason",
          when(col("r_word_count") === 0, "word_count")
            .when(col("r_word_len") === 0, "word_len")
            .when(col("r_diversity") === 0, "diversity")
            .when(col("r_stopword") === 0, "stopword")
            .otherwise(""))
        .orderBy(col("doc_id"))
    },

    // Inverted-index build: per term, document frequency, collection
    // frequency, and a BOUNDED posting list (the 20 lowest doc_ids).
    // The bound is the point at scale — an unbounded
    // collect_list(doc_id) for a stopword-grade term materializes one
    // row holding millions of ids (the giant-row problem real posting
    // lists solve by chunking); capping at k turns the list build into
    // a top-k-per-key problem, served by the native [[graft.plans
    // .TopKPerKey]] plan: per-partition k-bounded heaps, shuffle ≤ k
    // rows per term per input partition, never a full per-term sort.
    // df/cf come from the same (term, doc) pre-aggregate the heap
    // consumes, so the corpus is tokenized exactly once.
    QuerySpec.sql(
      "text_postings",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |pd AS (
        |  SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1, 2),
        |st AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS doc_freq,
        |    CAST(SUM(cnt) AS BIGINT) AS coll_freq
        |  FROM pd GROUP BY 1),
        |top AS (
        |  SELECT tok, doc_id FROM (
        |    SELECT tok, doc_id,
        |      row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
        |    FROM pd) WHERE rn <= 20),
        |pl AS (
        |  SELECT tok,
        |    array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
        |  FROM top GROUP BY 1)
        |SELECT st.tok, doc_freq, coll_freq, postings
        |FROM st JOIN pl USING (tok)
        |ORDER BY st.tok""".stripMargin) { (s, dir) =>
      val pd = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("cnt"))
      val st = pd.groupBy(col("tok"))
        .agg(count(lit(1)).cast("long").as("doc_freq"),
          sum(col("cnt")).cast("long").as("coll_freq"))
      // the serialized chunk is a flat string (the driver's comparator
      // is scalar-typed), carrying the same sorted id order either way
      val pl = graft.plans.TopKPerKey
        .topK(pd.select(col("tok"), col("doc_id")), Seq("tok"),
          Seq(("doc_id", false)), 20)
        .groupBy(col("tok"))
        .agg(array_join(sort_array(collect_list(col("doc_id"))), ",")
          .as("postings"))
      st.join(pl, Seq("tok")).orderBy(col("tok"))
    },

    // Source vocabulary overlap — the corpus-mixing diagnostic: word-
    // vocabulary Jaccard between every SOURCE pair (which domains
    // speak the same language, read before fixing mixture weights).
    // One (source, token) distinct pass; pairs are generated from the
    // per-TOKEN sorted source arrays (≤ |sources| long — the basket
    // discipline, never a row-scale self-join); per-source vocabulary
    // sizes broadcast back; Jaccard exact integer ppm.
    QuerySpec.sql(
      "text_source_vocab_overlap",
      """WITH st AS (
        |  SELECT DISTINCT source, tok FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)),
        |v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vs
        |  FROM st GROUP BY 1),
        |px AS (SELECT a.source AS sa, b.source AS sb,
        |    CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT sa, sb, inter, va.vs AS v_a, vb.vs AS v_b,
        |  CAST(inter * 1000000 // (va.vs + vb.vs - inter) AS BIGINT)
        |    AS jaccard_ppm
        |FROM px
        |JOIN v va ON va.source = sa
        |JOIN v vb ON vb.source = sb
        |ORDER BY sa, sb""".stripMargin) { (s, dir) =>
      val st = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
      val inter = st.groupBy(col("tok"))
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .select(explode(expr(
          """flatten(transform(ss, (x, ix) ->
            |  transform(slice(ss, ix + 2, size(ss)),
            |    y -> struct(x AS sa, y AS sb))))""".stripMargin)).as("p"))
        .groupBy(col("p.sa").as("sa"), col("p.sb").as("sb"))
        .agg(count(lit(1)).as("inter"))
      val v = st.groupBy(col("source")).agg(count(lit(1)).as("vs"))
      inter
        .join(broadcast(v.select(col("source").as("sa"),
          col("vs").as("v_a"))), Seq("sa"))
        .join(broadcast(v.select(col("source").as("sb"),
          col("vs").as("v_b"))), Seq("sb"))
        .select(col("sa"), col("sb"), col("inter"), col("v_a"), col("v_b"),
          expr("CAST(inter * 1000000 div (v_a + v_b - inter) AS BIGINT)")
            .as("jaccard_ppm"))
        .orderBy(col("sa"), col("sb"))
    },

    // Boolean AND retrieval — the conjunctive query the inverted
    // index exists to serve: documents containing ALL query terms,
    // with per-term tfs. The term filter lands BEFORE the (doc, term)
    // aggregate (only matching tokens survive the tokenize), the AND
    // is a distinct-term count over ≤ |query| rows per doc — postings
    // intersection as one hash aggregate, no per-term join chain.
    QuerySpec.sql(
      "text_bool_retrieval",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tok WHERE tok IN ('join', 'hash', 'scan')
        |  GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN tok = 'join' THEN tf ELSE 0 END) AS BIGINT)
        |    AS tf_join,
        |  CAST(SUM(CASE WHEN tok = 'hash' THEN tf ELSE 0 END) AS BIGINT)
        |    AS tf_hash,
        |  CAST(SUM(CASE WHEN tok = 'scan' THEN tf ELSE 0 END) AS BIGINT)
        |    AS tf_scan
        |FROM m GROUP BY 1 HAVING COUNT(*) = 3
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").isin("join", "hash", "scan"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("tok") === "join", col("tf")).otherwise(0L))
            .as("tf_join"),
          sum(when(col("tok") === "hash", col("tf")).otherwise(0L))
            .as("tf_hash"),
          sum(when(col("tok") === "scan", col("tf")).otherwise(0L))
            .as("tf_scan"),
          count(lit(1)).as("nterms"))
        .filter(col("nterms") === 3)
        .select(col("doc_id"), col("tf_join"), col("tf_hash"),
          col("tf_scan"))
        .orderBy(col("doc_id"))
    },

    // Interpolated bigram language model (Jelinek-Mercer smoothing):
    // P(w2|w1) = 0.7·c(w1 w2)/c(w1) + 0.3·(c(w2)+1)/(N+V), scored as
    // per-document mean NLL per bigram — the natural upgrade of
    // text_lm_score's unigram filter and the same quality signal CCNet
    // computes with a 5-gram KenLM. The same exactness discipline:
    // per-bigram log-probs round once to integer micros, document
    // scores are exact long sums of those micros (order-independent,
    // engine-identical), and the only double division is the final
    // mean. The doc-bigram → LM join is SALTED (factor 8): bigram
    // frequency is zipfian like unigrams, and the hot ("of", "the")
    // rows would otherwise converge on single reducers at 100 TB.
    QuerySpec.sql(
      "text_lm_kn", {
        // Interpolated Kneser-Ney, the production LM-quality filter
        // (Heafield's KenLM default): absolute discount D = 3/4 off
        // every seen bigram, mass recycled through the CONTINUATION
        // probability (how many distinct contexts w2 completes — the
        // "San Francisco" fix: frequent-but-predictable words score
        // low as continuations). With train = corpus every scored
        // bigram has c12 ≥ 1 > D, so the discounted term stays
        // positive. P is a rational with denominator 4·c1·tt; the ONE
        // shared ln text below is the only float, micro-quantized so
        // per-doc sums are exact longs (the lm_score discipline).
        val lnP = "ln(CAST(4 * c12 - 3 AS DOUBLE)" +
          " / CAST(4 * c1 AS DOUBLE)" +
          " + CAST(3 AS DOUBLE) * CAST(n1p AS DOUBLE)" +
          " * CAST(nctx AS DOUBLE)" +
          " / (CAST(4 AS DOUBLE) * CAST(c1 AS DOUBLE)" +
          " * CAST(tt AS DOUBLE)))"
        s"""WITH ws AS (
           |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
           |  WHERE len(string_split(text, ' ')) >= 2),
           |bg AS (
           |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
           |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
           |        FROM ws)),
           |pd AS (
           |  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM bg GROUP BY 1, 2, 3),
           |bc AS (
           |  SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c12
           |  FROM pd GROUP BY 1, 2),
           |ctx AS (
           |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
           |    CAST(COUNT(*) AS BIGINT) AS n1p
           |  FROM bc GROUP BY 1),
           |cont AS (
           |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS nctx
           |  FROM bc GROUP BY 1),
           |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM bc),
           |lp AS (
           |  SELECT bc.w1, bc.w2,
           |    CAST(CAST($lnP AS DECIMAL(18,6)) * 1000000 AS BIGINT)
           |      AS lp_micros
           |  FROM bc JOIN ctx USING (w1) JOIN cont USING (w2)
           |  CROSS JOIN tot)
           |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           |  CAST(-SUM(cnt * lp_micros) AS DOUBLE)
           |    / CAST(SUM(cnt) * 1000000 AS DOUBLE) AS avg_nll
           |FROM pd JOIN lp ON pd.w1 = lp.w1 AND pd.w2 = lp.w2
           |GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val lnP = "ln(CAST(4 * c12 - 3 AS DOUBLE)" +
        " / CAST(4 * c1 AS DOUBLE)" +
        " + CAST(3 AS DOUBLE) * CAST(n1p AS DOUBLE)" +
        " * CAST(nctx AS DOUBLE)" +
        " / (CAST(4 AS DOUBLE) * CAST(c1 AS DOUBLE)" +
        " * CAST(tt AS DOUBLE)))"
      val ws = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
      val pd = ws
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
          .as("b"))
        .groupBy(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .agg(count(lit(1)).as("cnt"))
      val bc = pd.groupBy(col("w1"), col("w2"))
        .agg(sum(col("cnt")).cast("long").as("c12"))
      val ctx = bc.groupBy(col("w1"))
        .agg(sum(col("c12")).cast("long").as("c1"),
          count(lit(1)).as("n1p"))
      val cont = bc.groupBy(col("w2"))
        .agg(count(lit(1)).as("nctx"))
      val tot = bc.agg(count(lit(1)).as("tt"))
      val lp = bc.join(ctx, Seq("w1")).join(cont, Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"),
          graft.functions.Cols.micros6(expr(lnP)).as("lp_micros"))
      graft.functions.Skew.saltedJoin(pd, lp, Seq("w1", "w2"), factor = 8)
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_bigrams"),
          sum(col("cnt") * col("lp_micros")).as("sm"))
        .select(col("doc_id"), col("n_bigrams"),
          ((-col("sm")).cast("double") /
            (col("n_bigrams") * lit(1000000L)).cast("double")).as("avg_nll"))
        .orderBy(col("doc_id"))
    },

    QuerySpec.sql(
      "text_lm_bigram",
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM ws)),
        |pd AS (
        |  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM bg GROUP BY 1, 2, 3),
        |bc AS (
        |  SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c12
        |  FROM pd GROUP BY 1, 2),
        |uni AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n_total,
        |    CAST(COUNT(*) AS BIGINT) AS v_size FROM uni),
        |lp AS (
        |  SELECT bc.w1, bc.w2,
        |    CAST(CAST(ln(
        |        0.7 * CAST(c12 AS DOUBLE) / CAST(u1.c AS DOUBLE)
        |      + 0.3 * CAST(u2.c + 1 AS DOUBLE)
        |          / CAST(n_total + v_size AS DOUBLE)) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS lp_micros
        |  FROM bc
        |  JOIN uni u1 ON u1.tok = bc.w1
        |  JOIN uni u2 ON u2.tok = bc.w2
        |  CROSS JOIN tot)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |  CAST(-SUM(cnt * lp_micros) AS DOUBLE)
        |    / CAST(SUM(cnt) * 1000000 AS DOUBLE) AS avg_nll
        |FROM pd JOIN lp ON pd.w1 = lp.w1 AND pd.w2 = lp.w2
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // ONE tokenize pass + ONE (doc, w1, w2) aggregate feeds BOTH
      // surfaces (r17): every token position emits exactly one pair
      // row — (token, next-token) inside a document, (token, NULL) at
      // the last position — so the per-doc bigram table is the
      // w2-non-null slice and the corpus unigram counts are
      // sum(cnt) GROUP BY w1 over ALL rows. Before r17 `uni` re-read
      // and re-split every document in a second scan subtree no
      // exchange reuse could deduplicate (different explode shape);
      // now all consumers hang off the one aggregate exchange.
      val g = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws)), " +
            "i -> struct(element_at(ws, i) AS w1, " +
            "if(i < size(ws), element_at(ws, i + 1), null) AS w2))"))
          .as("b"))
        .groupBy(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .agg(count(lit(1)).as("cnt"))
      val pd = g.filter(col("w2").isNotNull)
      val bc = pd.groupBy(col("w1"), col("w2"))
        .agg(sum(col("cnt")).as("c12"))
      val uni = g.groupBy(col("w1").as("tok"))
        .agg(sum(col("cnt")).as("c"))
      val tot = uni.agg(sum(col("c")).as("n_total"),
        count(lit(1)).as("v_size"))
      val lp = bc
        .join(uni.select(col("tok").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("tok").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"),
          graft.functions.Cols.micros6(
            log(lit(0.7) * col("c12").cast("double") / col("c1").cast("double")
              + lit(0.3) * (col("c2") + 1).cast("double") /
                (col("n_total") + col("v_size")).cast("double")))
            .as("lp_micros"))
      graft.functions.Skew.saltedJoin(pd, lp, Seq("w1", "w2"), factor = 8)
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_bigrams"),
          sum(col("cnt") * col("lp_micros")).as("sm"))
        .select(col("doc_id"), col("n_bigrams"),
          ((-col("sm")).cast("double") /
            (col("n_bigrams") * lit(1000000L)).cast("double")).as("avg_nll"))
        .orderBy(col("doc_id"))
    },

    // NDCG@10 of the BM25 retrieval (the ranking-eval readout every
    // retrieval stack owes its users — the AUC/PR gates grade the
    // CLASSIFIER; this grades the RANKER). Graded relevance is
    // deterministic: how many distinct query terms the document
    // contains (0–3), gain = 2^rel − 1, and the per-rank discounts
    // 1/log2(r+1) are a FIXED 10-entry micro-quantized literal table
    // shared verbatim with the oracle — so DCG, ideal DCG, and the
    // classically-float NDCG are exact integers that hash-compare.
    // Plan: the text_bm25_topk scorer (one tokenize pass, broadcast
    // df/scale), a TakeOrdered top-10, then 10-row bounded windows —
    // rank math never touches more than k rows however large the
    // corpus.
    QuerySpec.sql(
      "eval_ndcg",
      s"""WITH $rankEvalCte,
         |d AS (SELECT * FROM (VALUES $ndcgDiscSql)
         |  AS t(rnk, disc_micros)),
         |ideal AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id)
         |    AS rnk, rel
         |  FROM relv ORDER BY rel DESC, doc_id LIMIT 10),
         |icum AS (
         |  SELECT d.rnk,
         |    SUM((CASE i.rel WHEN 0 THEN 0 WHEN 1 THEN 1
         |        WHEN 2 THEN 3 ELSE 7 END) * d.disc_micros)
         |      OVER (ORDER BY d.rnk) AS idcg_cum
         |  FROM d JOIN ideal i ON i.rnk = d.rnk),
         |rcum AS (
         |  SELECT ret.rnk, ret.doc_id, relv.rel,
         |    CAST(CASE relv.rel WHEN 0 THEN 0 WHEN 1 THEN 1
         |      WHEN 2 THEN 3 ELSE 7 END AS BIGINT) AS gain,
         |    d.disc_micros,
         |    SUM((CASE relv.rel WHEN 0 THEN 0 WHEN 1 THEN 1
         |        WHEN 2 THEN 3 ELSE 7 END) * d.disc_micros)
         |      OVER (ORDER BY ret.rnk) AS dcg_cum
         |  FROM ret JOIN relv USING (doc_id) JOIN d ON d.rnk = ret.rnk)
         |SELECT CAST(r.rnk AS BIGINT) AS rnk, r.doc_id, r.rel, r.gain,
         |  CAST(r.disc_micros AS BIGINT) AS disc_micros,
         |  CAST(r.dcg_cum AS BIGINT) AS dcg_cum,
         |  CAST(i.idcg_cum AS BIGINT) AS idcg_cum,
         |  CAST(CASE WHEN i.idcg_cum > 0
         |    THEN r.dcg_cum * 1000000 // i.idcg_cum END AS BIGINT)
         |    AS ndcg_ppm
         |FROM rcum r JOIN icum i ON i.rnk = r.rnk
         |ORDER BY rnk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (ret, relv) = rankEval(s, dir)
      val d = ndcgDisc.toDF("rnk", "disc_micros")
      val cum = Window.orderBy(col("rnk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gainOf = (rel: org.apache.spark.sql.Column) =>
        when(rel === 0, 0L).when(rel === 1, 1L)
          .when(rel === 2, 3L).otherwise(7L)
      val ideal = relv
        .orderBy(col("rel").desc, col("doc_id")).limit(10)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("rel").desc,
            col("doc_id"))).cast("long"))
      val icum = broadcast(d).join(ideal, Seq("rnk"))
        .withColumn("idcg_cum",
          sum(gainOf(col("rel")) * col("disc_micros")).over(cum))
        .select(col("rnk"), col("idcg_cum"))
      ret.join(relv, Seq("doc_id"))
        .join(broadcast(d), Seq("rnk"))
        .withColumn("gain", gainOf(col("rel")))
        .withColumn("dcg_cum",
          sum(col("gain") * col("disc_micros")).over(cum))
        .join(icum, Seq("rnk"))
        .select(col("rnk"), col("doc_id"), col("rel"), col("gain"),
          col("disc_micros").cast("long").as("disc_micros"),
          col("dcg_cum").cast("long").as("dcg_cum"),
          col("idcg_cum").cast("long").as("idcg_cum"),
          expr("CAST(CASE WHEN idcg_cum > 0 THEN " +
            "dcg_cum * 1000000 div idcg_cum END AS BIGINT)")
            .as("ndcg_ppm"))
        .orderBy(col("rnk"))
    },

    // MAP / MRR / precision-recall@k over the same BM25 top-10, with
    // BINARY relevance (document contains ≥ 2 of the 3 query terms) —
    // the complementary ranking readout to eval_ndcg's graded one.
    // Average precision accumulates prec@r at each hit rank (exact
    // ppm integers, truncation shared with the oracle) and divides by
    // min(|relevant|, k); reciprocal rank is 10^6 // first-hit rank.
    // Every metric is a per-rank CUMULATIVE column, so the gate pins
    // the whole trajectory, not one scalar. Same bounded-window
    // posture as eval_ndcg: corpus-scale work ends at the top-k cut.
    QuerySpec.sql(
      "eval_map_mrr",
      s"""WITH $rankEvalCte,
         |nrel AS (SELECT CAST(SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0
         |  END) AS BIGINT) AS n_rel FROM relv),
         |h AS (
         |  SELECT ret.rnk, ret.doc_id,
         |    CAST(CASE WHEN relv.rel >= 2 THEN 1 ELSE 0 END
         |      AS BIGINT) AS hit
         |  FROM ret JOIN relv USING (doc_id)),
         |c AS (
         |  SELECT rnk, doc_id, hit,
         |    SUM(hit) OVER (ORDER BY rnk) AS hits_cum,
         |    MIN(CASE WHEN hit = 1 THEN rnk END) OVER (ORDER BY rnk)
         |      AS first_hit
         |  FROM h),
         |p AS (
         |  SELECT rnk, doc_id, hit, hits_cum, first_hit,
         |    hits_cum * 1000000 // rnk AS prec_ppm
         |  FROM c),
         |a AS (
         |  SELECT rnk, doc_id, hit, hits_cum, prec_ppm, first_hit,
         |    SUM(hit * prec_ppm) OVER (ORDER BY rnk) AS ap_num
         |  FROM p)
         |SELECT CAST(a.rnk AS BIGINT) AS rnk, a.doc_id, a.hit,
         |  CAST(a.hits_cum AS BIGINT) AS hits_cum,
         |  CAST(a.prec_ppm AS BIGINT) AS prec_ppm,
         |  CAST(CASE WHEN n.n_rel > 0
         |    THEN a.hits_cum * 1000000 // n.n_rel END AS BIGINT)
         |    AS recall_ppm,
         |  CAST(CASE WHEN LEAST(n.n_rel, 10) > 0
         |    THEN a.ap_num // LEAST(n.n_rel, 10) END AS BIGINT)
         |    AS ap_ppm,
         |  CAST(CASE WHEN a.first_hit IS NOT NULL
         |    THEN 1000000 // a.first_hit END AS BIGINT) AS rr_ppm
         |FROM a CROSS JOIN nrel n
         |ORDER BY rnk""".stripMargin) { (s, dir) =>
      val (ret, relv) = rankEval(s, dir)
      val cum = Window.orderBy(col("rnk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nrel = relv.agg(
        sum(when(col("rel") >= 2, 1L).otherwise(0L)).as("n_rel"))
      ret.join(relv, Seq("doc_id"))
        .withColumn("hit",
          when(col("rel") >= 2, 1L).otherwise(0L))
        .withColumn("hits_cum", sum(col("hit")).over(cum))
        .withColumn("first_hit",
          min(when(col("hit") === 1, col("rnk"))).over(cum))
        .withColumn("prec_ppm",
          expr("hits_cum * 1000000 div rnk"))
        .withColumn("ap_num", sum(col("hit") * col("prec_ppm")).over(cum))
        .crossJoin(broadcast(nrel))
        .select(col("rnk"), col("doc_id"), col("hit"),
          col("hits_cum").cast("long").as("hits_cum"),
          col("prec_ppm").cast("long").as("prec_ppm"),
          expr("CAST(CASE WHEN n_rel > 0 THEN " +
            "hits_cum * 1000000 div n_rel END AS BIGINT)")
            .as("recall_ppm"),
          expr("CAST(CASE WHEN LEAST(n_rel, 10) > 0 THEN " +
            "ap_num div LEAST(n_rel, 10) END AS BIGINT)").as("ap_ppm"),
          expr("CAST(CASE WHEN first_hit IS NOT NULL THEN " +
            "1000000 div first_hit END AS BIGINT)").as("rr_ppm"))
        .orderBy(col("rnk"))
    },

    // Yule's characteristic K per document (Yule 1944) — the
    // repeated-vocabulary richness statistic the mattr/simpson gates
    // don't cover: K = 10^4 · (Σc² − Σc) / (Σc)², driven entirely by
    // how often the SAME type repeats, and famously length-stable
    // where raw type/token ratio is not. Reported in exact
    // milli-units ((S2−S1)·10^7 // S1²); hapax and dis legomena
    // counts ride along (the Honoré/Sichel inputs). Products cap at
    // S2·10^7 ≤ |doc|²·10^7 — BIGINT-safe for any document under ~30k
    // tokens, far above the corpus envelope. Plan: one tokenize pass,
    // per-(doc,token) count, per-doc fold — map-side combinable,
    // doc_id-keyed, no window.
    QuerySpec.sql(
      "text_yule_k",
      """WITH c AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t
        |  GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dis,
        |  CAST(CASE WHEN SUM(c) > 0 THEN
        |    (SUM(c * c) - SUM(c)) * 10000000 // (SUM(c) * SUM(c))
        |    END AS BIGINT) AS yule_k_milli
        |FROM c GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("s1"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_dis"),
          sum(col("c") * col("c")).as("s2"))
        .select(col("doc_id"),
          col("s1").cast("long").as("n_tokens"),
          col("n_types"), col("n_hapax"), col("n_dis"),
          expr("CAST(CASE WHEN s1 > 0 THEN " +
            "(s2 - s1) * 10000000 div (s1 * s1) END AS BIGINT)")
            .as("yule_k_milli"))
        .orderBy(col("doc_id"))
    },

    // Per-document n-gram NOVELTY in corpus order — of a document's
    // distinct word trigrams, how many appear for the FIRST time in
    // this document (no lower doc_id contains them)? The curation
    // readout behind "is the tail of this source adding anything new"
    // — complementary to text_dup_ngram_mass (which scores REPEATED
    // mass; this scores first-seen mass) and to text_vocab_growth
    // (unigram types; trigrams saturate far slower). Exact by
    // construction: first-occurrence doc = MIN(doc_id) per trigram,
    // one hash-agg over the (trigram → min-doc) table — map-side
    // combinable MIN, no window, no self-join; the per-doc novel
    // count is a second hash-agg of that table keyed by the min doc.
    QuerySpec.sql(
      "text_ngram_novelty",
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
        |        FROM ws)),
        |fst AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY 1),
        |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        |        FROM g GROUP BY 1),
        |nov AS (SELECT first_doc AS doc_id,
        |          CAST(COUNT(*) AS BIGINT) AS n_novel
        |        FROM fst GROUP BY 1)
        |SELECT t.doc_id, t.n_grams,
        |  CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(COALESCE(n.n_novel, 0) * 1000000 // t.n_grams
        |    AS BIGINT) AS novelty_ppm
        |FROM tot t LEFT JOIN nov n USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      val g = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', " +
            "element_at(ws, i), element_at(ws, i + 1), " +
            "element_at(ws, i + 2)))")).as("g"))
        .distinct()
      val tot = g.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"))
      val nov = g.groupBy(col("g"))
        .agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_novel"))
      tot.join(nov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_novel"), lit(0L)).cast("long").as("n_novel"),
          expr("CAST(COALESCE(n_novel, 0) * 1000000 div n_grams " +
            "AS BIGINT)").as("novelty_ppm"))
        .orderBy(col("doc_id"))
    },

    // Fleiss' kappa — chance-corrected agreement of THREE annotators
    // (the multi-rater member of the agreement family next to the
    // two-rater eval_cohens_kappa). The raters are three cheap
    // deterministic length annotators (char / token / distinct-token
    // terciles) labeling every document short/medium/long — the
    // inter-annotator-agreement readout any labeling pipeline owes
    // before trusting a rubric. Exact rational: with n=3 raters,
    // kappa = (3N·S1 − 2ΣT²) / (2·(9N² − ΣT²)) where
    // S1 = Σ_i(Σ_j n_ij² − 3) and T_j are category totals — both
    // engines fold the same integers (ΣT² rides DECIMAL(38,0)/
    // HUGEINT past N ≈ 10⁹), and `//`/`div` both truncate toward
    // zero, so the signed kappa hash-compares. Plan: one per-row
    // annotate pass (no explode — list_distinct is per-row), one
    // 9-ary category fold + one per-subject fold, three scalar rows
    // joined broadcast.
    QuerySpec.sql(
      "eval_fleiss_kappa",
      """WITH r AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 350 THEN 1
        |      ELSE 2 END AS r1,
        |    CASE WHEN len(string_split(text, ' ')) < 37 THEN 0
        |      WHEN len(string_split(text, ' ')) < 64 THEN 1 ELSE 2
        |      END AS r2,
        |    CASE WHEN len(list_distinct(string_split(text, ' '))) < 19
        |        THEN 0
        |      WHEN len(list_distinct(string_split(text, ' '))) < 33
        |        THEN 1 ELSE 2 END AS r3
        |  FROM documents),
        |nij AS (
        |  SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS nij
        |  FROM (SELECT doc_id, unnest([r1, r2, r3]) AS cat FROM r)
        |  GROUP BY 1, 2),
        |s1 AS (
        |  SELECT CAST(SUM(sq) - 3 * COUNT(*) AS BIGINT) AS s1,
        |    CAST(COUNT(*) AS BIGINT) AS nsub
        |  FROM (SELECT doc_id, SUM(nij * nij) AS sq
        |        FROM nij GROUP BY 1)),
        |t2 AS (
        |  SELECT CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS st2
        |  FROM (SELECT cat, SUM(nij) AS t FROM nij GROUP BY 1))
        |SELECT nsub AS n_subjects,
        |  CAST(s1 * 1000000 // (6 * nsub) AS BIGINT) AS p_bar_ppm,
        |  CAST(st2 * 1000000 // (9 * CAST(nsub AS HUGEINT) * nsub)
        |    AS BIGINT) AS p_e_ppm,
        |  CAST((3 * CAST(nsub AS HUGEINT) * s1 - 2 * st2) * 1000000
        |    // (2 * (9 * CAST(nsub AS HUGEINT) * nsub - st2))
        |    AS BIGINT) AS kappa_ppm,
        |  CASE
        |    WHEN (3 * CAST(nsub AS HUGEINT) * s1 - 2 * st2) * 1000000
        |      // (2 * (9 * CAST(nsub AS HUGEINT) * nsub - st2))
        |      > 600000 THEN 'substantial'
        |    WHEN (3 * CAST(nsub AS HUGEINT) * s1 - 2 * st2) * 1000000
        |      // (2 * (9 * CAST(nsub AS HUGEINT) * nsub - st2))
        |      > 400000 THEN 'moderate'
        |    WHEN (3 * CAST(nsub AS HUGEINT) * s1 - 2 * st2) * 1000000
        |      // (2 * (9 * CAST(nsub AS HUGEINT) * nsub - st2))
        |      > 200000 THEN 'fair'
        |    ELSE 'slight' END AS agreement
        |FROM s1 CROSS JOIN t2""".stripMargin) { (s, dir) =>
      val r = docs(s, dir)
        .select(col("doc_id"),
          when(col("n_chars") < 200, 0L)
            .when(col("n_chars") < 350, 1L).otherwise(2L).as("r1"),
          when(size(split(col("text"), " ")) < 37, 0L)
            .when(size(split(col("text"), " ")) < 64, 1L)
            .otherwise(2L).as("r2"),
          when(size(array_distinct(split(col("text"), " "))) < 19, 0L)
            .when(size(array_distinct(split(col("text"), " "))) < 33,
              1L).otherwise(2L).as("r3"))
      val nij = r
        .select(col("doc_id"),
          explode(array(col("r1"), col("r2"), col("r3"))).as("cat"))
        .groupBy(col("doc_id"), col("cat"))
        .agg(count(lit(1)).as("nij"))
      val s1 = nij.groupBy(col("doc_id"))
        .agg(sum(col("nij") * col("nij")).as("sq"))
        .agg((sum(col("sq")) - lit(3L) * count(lit(1)))
            .cast("long").as("s1"),
          count(lit(1)).as("nsub"))
      val t2 = nij.groupBy(col("cat"))
        .agg(sum(col("nij")).as("t"))
        .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * t"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("st2"))
      val kap = "(3 * CAST(nsub AS DECIMAL(38,0)) * s1 - 2 * st2) " +
        "* 1000000 div (2 * (9 * CAST(nsub AS DECIMAL(38,0)) * nsub " +
        "- st2))"
      s1.crossJoin(broadcast(t2))
        .select(col("nsub").as("n_subjects"),
          expr("CAST(s1 * 1000000 div (6 * nsub) AS BIGINT)")
            .as("p_bar_ppm"),
          expr("CAST(st2 * 1000000 div " +
            "(9 * CAST(nsub AS DECIMAL(38,0)) * nsub) AS BIGINT)")
            .as("p_e_ppm"),
          expr(s"CAST($kap AS BIGINT)").as("kappa_ppm"),
          expr(s"CASE WHEN $kap > 600000 THEN 'substantial' " +
            s"WHEN $kap > 400000 THEN 'moderate' " +
            s"WHEN $kap > 200000 THEN 'fair' " +
            "ELSE 'slight' END").as("agreement"))
    },

    // Krippendorff's alpha (nominal, same three annotators as
    // eval_fleiss_kappa): the agreement coefficient that generalizes
    // across rater counts and, unlike kappa, is anchored at the
    // PAIRWISE disagreement rate. With m = 3 raters per unit the
    // whole statistic collapses to one exact integer rational:
    // alpha = 1 − [(9N − S)·(3N − 1)] / [2·(9N² − ΣT²)] where
    // S = Σ_u Σ_c n_uc² and T_c the category totals — the N² terms
    // ride DECIMAL(38,0)/HUGEINT past N ≈ 10⁹. alpha_ppm is ONE
    // floor division of the full rational (no intermediate
    // truncation). Plan: per-row annotate → per-(unit,cat) fold →
    // two scalar rows joined broadcast; no window anywhere.
    QuerySpec.sql(
      "eval_krippendorff_alpha",
      s"""WITH $ratersNijSql,
         |su AS (
         |  SELECT CAST(SUM(sq) AS BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS nsub
         |  FROM (SELECT doc_id, SUM(nij * nij) AS sq
         |        FROM nij GROUP BY 1)),
         |t2 AS (
         |  SELECT CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS st2
         |  FROM (SELECT cat, SUM(nij) AS t FROM nij GROUP BY 1))
         |SELECT nsub AS n_subjects,
         |  CAST((9 * nsub - s) * 1000000 // (6 * nsub) AS BIGINT)
         |    AS d_o_ppm,
         |  CAST((9 * CAST(nsub AS HUGEINT) * nsub - st2) * 1000000
         |    // (CAST(3 AS HUGEINT) * nsub * (3 * nsub - 1))
         |    AS BIGINT) AS d_e_ppm,
         |  CAST((2 * (9 * CAST(nsub AS HUGEINT) * nsub - st2)
         |      - (9 * nsub - s) * CAST(3 * nsub - 1 AS HUGEINT))
         |      * 1000000
         |    // (2 * (9 * CAST(nsub AS HUGEINT) * nsub - st2))
         |    AS BIGINT) AS alpha_ppm
         |FROM su CROSS JOIN t2""".stripMargin) { (s, dir) =>
      val nij = raterNij(s, dir)
      val su = nij.groupBy(col("doc_id"))
        .agg(sum(col("nij") * col("nij")).as("sq"))
        .agg(sum(col("sq")).cast("long").as("s"),
          count(lit(1)).as("nsub"))
      val t2 = nij.groupBy(col("cat"))
        .agg(sum(col("nij")).as("t"))
        .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * t"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("st2"))
      su.crossJoin(broadcast(t2))
        .select(col("nsub").as("n_subjects"),
          expr("CAST((9 * nsub - s) * 1000000 div (6 * nsub) " +
            "AS BIGINT)").as("d_o_ppm"),
          expr("CAST((9 * CAST(nsub AS DECIMAL(38,0)) * nsub - st2) " +
            "* 1000000 div (CAST(3 AS DECIMAL(38,0)) * nsub " +
            "* (3 * nsub - 1)) AS BIGINT)").as("d_e_ppm"),
          expr("CAST((2 * (9 * CAST(nsub AS DECIMAL(38,0)) * nsub " +
            "- st2) - (9 * nsub - s) " +
            "* CAST(3 * nsub - 1 AS DECIMAL(38,0))) * 1000000 " +
            "div (2 * (9 * CAST(nsub AS DECIMAL(38,0)) * nsub - st2))" +
            " AS BIGINT)").as("alpha_ppm"))
    },

    // Gwet's AC1 (same annotator frame): the agreement coefficient
    // that stays stable when category prevalence is skewed — the
    // known kappa paradox. With q = 3 categories and m = 3 raters:
    // AC1 = (3N·S1 − 9N² + ΣT²) / (9N² + ΣT²) with S1 = S − 3N
    // (fleiss' per-unit agreement sum) — again ONE exact rational,
    // one floor division, N² terms in DECIMAL(38,0)/HUGEINT. Same
    // two-fold + broadcast-scalar plan as alpha; no window.
    QuerySpec.sql(
      "eval_gwet_ac1",
      s"""WITH $ratersNijSql,
         |su AS (
         |  SELECT CAST(SUM(sq) - 3 * COUNT(*) AS BIGINT) AS s1,
         |    CAST(COUNT(*) AS BIGINT) AS nsub
         |  FROM (SELECT doc_id, SUM(nij * nij) AS sq
         |        FROM nij GROUP BY 1)),
         |t2 AS (
         |  SELECT CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS st2
         |  FROM (SELECT cat, SUM(nij) AS t FROM nij GROUP BY 1))
         |SELECT nsub AS n_subjects,
         |  CAST(s1 * 1000000 // (6 * nsub) AS BIGINT) AS p_a_ppm,
         |  CAST((9 * CAST(nsub AS HUGEINT) * nsub - st2) * 1000000
         |    // (18 * CAST(nsub AS HUGEINT) * nsub) AS BIGINT)
         |    AS p_e_ppm,
         |  CAST((3 * CAST(nsub AS HUGEINT) * s1
         |      - 9 * CAST(nsub AS HUGEINT) * nsub + st2) * 1000000
         |    // (9 * CAST(nsub AS HUGEINT) * nsub + st2) AS BIGINT)
         |    AS ac1_ppm
         |FROM su CROSS JOIN t2""".stripMargin) { (s, dir) =>
      val nij = raterNij(s, dir)
      val su = nij.groupBy(col("doc_id"))
        .agg(sum(col("nij") * col("nij")).as("sq"))
        .agg((sum(col("sq")) - lit(3L) * count(lit(1)))
            .cast("long").as("s1"),
          count(lit(1)).as("nsub"))
      val t2 = nij.groupBy(col("cat"))
        .agg(sum(col("nij")).as("t"))
        .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * t"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("st2"))
      su.crossJoin(broadcast(t2))
        .select(col("nsub").as("n_subjects"),
          expr("CAST(s1 * 1000000 div (6 * nsub) AS BIGINT)")
            .as("p_a_ppm"),
          expr("CAST((9 * CAST(nsub AS DECIMAL(38,0)) * nsub - st2) " +
            "* 1000000 div (18 * CAST(nsub AS DECIMAL(38,0)) * nsub)" +
            " AS BIGINT)").as("p_e_ppm"),
          expr("CAST((3 * CAST(nsub AS DECIMAL(38,0)) * s1 " +
            "- 9 * CAST(nsub AS DECIMAL(38,0)) * nsub + st2) " +
            "* 1000000 div (9 * CAST(nsub AS DECIMAL(38,0)) * nsub " +
            "+ st2) AS BIGINT)").as("ac1_ppm"))
    },

    // Linear-WEIGHTED Cohen's kappa between the char-tercile and
    // token-tercile annotators (the fleiss frame's r1/r2, thresholds
    // verbatim): for ORDINAL labels the unweighted kappa punishes a
    // short↔medium slip as hard as short↔long — the weighted form is
    // what an ordinal-rubric audit actually reads. With w_ij = |i−j|:
    // κ_w = 1 − N·Σw·O / Σw·(a_i·b_j), one exact ppm rational (N²
    // marginal products in DECIMAL(38,0)/HUGEINT). Plan: one per-row
    // annotate → 3×3 confusion fold → 3-row marginal cross (bounded)
    // → scalar.
    QuerySpec.sql(
      "eval_weighted_kappa",
      """WITH r AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 350 THEN 1
        |      ELSE 2 END AS r1,
        |    CASE WHEN len(string_split(text, ' ')) < 37 THEN 0
        |      WHEN len(string_split(text, ' ')) < 64 THEN 1 ELSE 2
        |      END AS r2
        |  FROM documents),
        |o AS (SELECT r1, r2, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM r GROUP BY 1, 2),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM o),
        |ma AS (SELECT r1, CAST(SUM(c) AS BIGINT) AS a FROM o
        |  GROUP BY 1),
        |mb AS (SELECT r2, CAST(SUM(c) AS BIGINT) AS b FROM o
        |  GROUP BY 1),
        |od AS (SELECT CAST(SUM(ABS(r1 - r2) * c) AS BIGINT) AS wo
        |  FROM o),
        |ed AS (SELECT CAST(SUM(ABS(ma.r1 - mb.r2)
        |    * CAST(ma.a AS HUGEINT) * mb.b) AS HUGEINT) AS we
        |  FROM ma CROSS JOIN mb)
        |SELECT nn AS n_docs, wo AS obs_disagree_w,
        |  CAST(we AS BIGINT) AS exp_disagree_w_xn,
        |  CAST(1000000 - CAST(nn AS HUGEINT) * wo * 1000000 // we
        |    AS BIGINT) AS kappa_w_ppm
        |FROM n, od, ed""".stripMargin) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val o = docs(s, dir)
        .select(
          when(col("n_chars") < 200, 0L)
            .when(col("n_chars") < 350, 1L).otherwise(2L).as("r1"),
          when(size(split(col("text"), " ")) < 37, 0L)
            .when(size(split(col("text"), " ")) < 64, 1L)
            .otherwise(2L).as("r2"))
        .groupBy(col("r1"), col("r2"))
        .agg(count(lit(1)).as("c"))
      val n = o.agg(sum(col("c")).cast("long").as("nn"))
      val ma = o.groupBy(col("r1")).agg(sum(col("c")).as("a"))
      val mb = o.groupBy(col("r2")).agg(sum(col("c")).as("b"))
      val od = o.agg(sum(abs(col("r1") - col("r2")) * col("c"))
        .cast("long").as("wo"))
      val ed = ma.crossJoin(broadcast(mb))
        .agg(sum(expr("ABS(r1 - r2) * CAST(a AS DECIMAL(38,0)) * b"))
          .cast(d38).as("we"))
      n.crossJoin(broadcast(od)).crossJoin(broadcast(ed))
        .select(col("nn").as("n_docs"), col("wo").as("obs_disagree_w"),
          col("we").cast("long").as("exp_disagree_w_xn"),
          expr("CAST(1000000 - CAST(nn AS DECIMAL(38,0)) * wo " +
            "* 1000000 div we AS BIGINT)").as("kappa_w_ppm"))
    },

    // Coleman–Liau readability per source — the grade-level readout
    // quality filters gate on, chosen over Flesch BECAUSE it needs no
    // syllable model: CLI = 0.0588·L − 0.296·S − 15.8 with
    // L = 100·chars/words, S = 100·sentences/words collapses to ONE
    // exact centi rational, (588·C − 2960·Snt − 1580·W) // W, over
    // three per-source integer counts. Letters count via a
    // global-flag regexp strip (DuckDB needs the explicit 'g' — its
    // default is first-match, the er_phonetic_blocking lesson);
    // sentences by the text_sentences splitter verbatim. One
    // map-side-combinable fold; C·588 rides HUGEINT/DECIMAL(38,0) so
    // a 10¹⁶-char source can't wrap.
    QuerySpec.sql(
      "text_coleman_liau",
      """WITH d AS (
        |  SELECT source,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |      AS BIGINT) AS c,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |    CAST(len(string_split_regex(text, '[.!?] ')) AS BIGINT)
        |      AS snt
        |  FROM documents),
        |a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(c) AS BIGINT) AS n_alpha,
        |    CAST(SUM(w) AS BIGINT) AS n_words,
        |    CAST(SUM(snt) AS BIGINT) AS n_sentences
        |  FROM d GROUP BY 1)
        |SELECT source, n_docs, n_alpha, n_words, n_sentences,
        |  CAST((588 * CAST(n_alpha AS HUGEINT) - 2960 * n_sentences
        |    - 1580 * n_words) // n_words AS BIGINT) AS cli_centi,
        |  CASE WHEN (588 * CAST(n_alpha AS HUGEINT)
        |      - 2960 * n_sentences - 1580 * n_words) // n_words >= 1200
        |    THEN 'college'
        |    WHEN (588 * CAST(n_alpha AS HUGEINT) - 2960 * n_sentences
        |      - 1580 * n_words) // n_words >= 800 THEN 'secondary'
        |    ELSE 'primary' END AS band
        |FROM a ORDER BY source""".stripMargin) { (s, dir) =>
      val a = docs(s, dir)
        .select(col("source"),
          length(regexp_replace(col("text"), "[^A-Za-z]", ""))
            .cast("long").as("c"),
          size(split(col("text"), " ")).cast("long").as("w"),
          size(split(col("text"), "[.!?] ")).cast("long").as("snt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("c")).cast("long").as("n_alpha"),
          sum(col("w")).cast("long").as("n_words"),
          sum(col("snt")).cast("long").as("n_sentences"))
      val cli = "(588 * CAST(n_alpha AS DECIMAL(38,0)) " +
        "- 2960 * n_sentences - 1580 * n_words) div n_words"
      a.select(col("source"), col("n_docs"), col("n_alpha"),
          col("n_words"), col("n_sentences"),
          expr(s"CAST($cli AS BIGINT)").as("cli_centi"),
          expr(s"CASE WHEN $cli >= 1200 THEN 'college' " +
            s"WHEN $cli >= 800 THEN 'secondary' " +
            "ELSE 'primary' END").as("band"))
        .orderBy(col("source"))
    },

    // Corpus-level BLEU-2 between source-adjacent documents — the
    // n-gram-overlap translation metric repurposed as a SOURCE
    // SELF-SIMILARITY readout (how templated is each source's
    // stream?): candidate = each document, reference = its
    // predecessor in the same source. MICRO-averaged per source
    // (total clipped matches over total candidate n-grams), so the
    // classically per-sentence-float metric is two exact ppm
    // integers; the geometric mean rides IEEE-754's CORRECTLY-ROUNDED
    // sqrt (bit-identical in both engines) over an exact integer
    // product, then floors. No brevity penalty is needed — the length
    // ratio is reported as its own exact column instead of inside an
    // exp(). Plan: source-keyed LAG pairing, (doc,token)-keyed clip
    // joins (uniform keys), one per-source fold.
    QuerySpec.sql(
      "eval_bleu_pairs",
      """WITH pr AS (
        |  SELECT source, doc_id AS cand_id,
        |    LAG(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS ref_id
        |  FROM documents),
        |p AS (SELECT * FROM pr WHERE ref_id IS NOT NULL),
        |u AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t
        |  GROUP BY 1, 2),
        |bg AS (
        |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |    FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |          FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |                FROM documents
        |                WHERE len(string_split(text, ' ')) >= 2) w))
        |  GROUP BY 1, 2),
        |ul AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS len
        |  FROM u GROUP BY 1),
        |bl AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS len
        |  FROM bg GROUP BY 1),
        |m1 AS (
        |  SELECT p.source AS source, p.cand_id AS cand_id,
        |    CAST(SUM(LEAST(uc.cnt, ur.cnt)) AS BIGINT) AS clip
        |  FROM p JOIN u uc ON uc.doc_id = p.cand_id
        |  JOIN u ur ON ur.doc_id = p.ref_id AND ur.tok = uc.tok
        |  GROUP BY 1, 2),
        |m2 AS (
        |  SELECT p.source AS source, p.cand_id AS cand_id,
        |    CAST(SUM(LEAST(bc.cnt, br.cnt)) AS BIGINT) AS clip
        |  FROM p JOIN bg bc ON bc.doc_id = p.cand_id
        |  JOIN bg br ON br.doc_id = p.ref_id AND br.g = bc.g
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT p.source AS source,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(COALESCE(m1.clip, 0)) AS BIGINT) AS clip1,
        |    CAST(SUM(ulc.len) AS BIGINT) AS cand1,
        |    CAST(SUM(ulr.len) AS BIGINT) AS ref1,
        |    CAST(SUM(COALESCE(m2.clip, 0)) AS BIGINT) AS clip2,
        |    CAST(SUM(COALESCE(blc.len, 0)) AS BIGINT) AS cand2
        |  FROM p
        |  JOIN ul ulc ON ulc.doc_id = p.cand_id
        |  JOIN ul ulr ON ulr.doc_id = p.ref_id
        |  LEFT JOIN bl blc ON blc.doc_id = p.cand_id
        |  LEFT JOIN m1 ON m1.source = p.source
        |    AND m1.cand_id = p.cand_id
        |  LEFT JOIN m2 ON m2.source = p.source
        |    AND m2.cand_id = p.cand_id
        |  GROUP BY 1)
        |SELECT source, n_pairs,
        |  CAST(clip1 * 1000000 // cand1 AS BIGINT) AS p1_ppm,
        |  CAST(CASE WHEN cand2 > 0 THEN clip2 * 1000000 // cand2 END
        |    AS BIGINT) AS p2_ppm,
        |  CAST(CASE WHEN cand2 > 0 THEN CAST(floor(sqrt(CAST(
        |    (clip1 * 1000000 // cand1) * (clip2 * 1000000 // cand2)
        |    AS DOUBLE))) AS BIGINT) END AS BIGINT) AS bleu2_ppm,
        |  CAST(cand1 * 1000000 // ref1 AS BIGINT) AS len_ratio_ppm
        |FROM agg ORDER BY source""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val p = d.select(col("source"), col("doc_id").as("cand_id"),
          lag(col("doc_id"), 1).over(Window.partitionBy(col("source"))
            .orderBy(col("doc_id"))).as("ref_id"))
        .filter(col("ref_id").isNotNull)
      val u = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
      val bgr = d
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', " +
            "element_at(ws, i), element_at(ws, i + 1)))")).as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("cnt"))
      val ul = u.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).cast("long").as("len"))
      val bl = bgr.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).cast("long").as("len"))
      val m1 = p
        .join(u.select(col("doc_id").as("cand_id"), col("tok"),
          col("cnt").as("ccnt")), Seq("cand_id"))
        .join(u.select(col("doc_id").as("ref_id"), col("tok"),
          col("cnt").as("rcnt")), Seq("ref_id", "tok"))
        .groupBy(col("source"), col("cand_id"))
        .agg(sum(least(col("ccnt"), col("rcnt"))).as("clip1"))
      val m2 = p
        .join(bgr.select(col("doc_id").as("cand_id"), col("g"),
          col("cnt").as("ccnt")), Seq("cand_id"))
        .join(bgr.select(col("doc_id").as("ref_id"), col("g"),
          col("cnt").as("rcnt")), Seq("ref_id", "g"))
        .groupBy(col("source"), col("cand_id"))
        .agg(sum(least(col("ccnt"), col("rcnt"))).as("clip2"))
      p.join(ul.select(col("doc_id").as("cand_id"),
          col("len").as("clen")), Seq("cand_id"))
        .join(ul.select(col("doc_id").as("ref_id"),
          col("len").as("rlen")), Seq("ref_id"))
        .join(bl.select(col("doc_id").as("cand_id"),
          col("len").as("c2len")), Seq("cand_id"), "left")
        .join(m1, Seq("source", "cand_id"), "left")
        .join(m2, Seq("source", "cand_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(coalesce(col("clip1"), lit(0L))).cast("long")
            .as("clip1"),
          sum(col("clen")).cast("long").as("cand1"),
          sum(col("rlen")).cast("long").as("ref1"),
          sum(coalesce(col("clip2"), lit(0L))).cast("long")
            .as("clip2"),
          sum(coalesce(col("c2len"), lit(0L))).cast("long")
            .as("cand2"))
        .select(col("source"), col("n_pairs"),
          expr("CAST(clip1 * 1000000 div cand1 AS BIGINT)")
            .as("p1_ppm"),
          expr("CAST(CASE WHEN cand2 > 0 THEN " +
            "clip2 * 1000000 div cand2 END AS BIGINT)").as("p2_ppm"),
          expr("CAST(CASE WHEN cand2 > 0 THEN CAST(floor(sqrt(CAST(" +
            "(clip1 * 1000000 div cand1) * " +
            "(clip2 * 1000000 div cand2) AS DOUBLE))) AS BIGINT) " +
            "END AS BIGINT)").as("bleu2_ppm"),
          expr("CAST(cand1 * 1000000 div ref1 AS BIGINT)")
            .as("len_ratio_ppm"))
        .orderBy(col("source"))
    },

    // ROUGE-L over a 20% evaluation sample of the same adjacent
    // candidate↔reference pairs as eval_bleu_pairs — the RECALL-side
    // text-overlap metric (BLEU clips n-gram precision; ROUGE-L
    // rewards the longest common SUBSEQUENCE, order-sensitive but
    // gap-tolerant). The LCS is an exact integer DP with the
    // map-only discipline of ts_dtw_pairs, processed by
    // ANTI-DIAGONALS: every cell on diagonal d = i+j depends only on
    // diagonals d−1 and d−2, so each fold step is ONE transform that
    // builds the whole diagonal — no growing-array append (a
    // row-by-row fold spends O(n·m²) COPYING immutable arrays; this
    // shape measured 8× faster), no scan dependency, no recursive
    // CTE, no UDF. DuckDB's list_reduce pins acc type = element
    // type, so the two carried diagonals ride as a 2-element
    // list-of-lists and the step index as [[d]]. P/R/F₁ land as
    // exact ppm divisions (F₁ = 2L/(n_c + n_r)); per-source macro
    // means of those exact ppms. Each pair's DP is O(n·m) on
    // ≤ 100-token frames — bounded metadata work, embarrassingly
    // parallel; the % 5 sample is the eval-harness shape (score a
    // held-out slice, not the corpus).
    QuerySpec.sql(
      "eval_rouge_l",
      """WITH pr AS (
        |  SELECT source, doc_id AS cand_id,
        |    LAG(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS ref_id
        |  FROM documents),
        |p AS (SELECT * FROM pr
        |  WHERE ref_id IS NOT NULL AND cand_id % 5 = 0),
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |lc AS (
        |  SELECT p.source, p.cand_id,
        |    CAST(len(c.ws) AS BIGINT) AS nc,
        |    CAST(len(r.ws) AS BIGINT) AS nr,
        |    list_reduce(
        |      list_concat(
        |        [[list_transform(generate_series(0, len(c.ws)),
        |            z -> CAST(0 AS BIGINT)),
        |          list_transform(generate_series(0, len(c.ws)),
        |            z -> CAST(0 AS BIGINT))]],
        |        list_transform(
        |          generate_series(2, len(c.ws) + len(r.ws)),
        |          d -> [[CAST(d AS BIGINT)]])),
        |      (acc, x) -> [
        |        list_transform(generate_series(0, len(c.ws)), i ->
        |          CASE WHEN i >= 1 AND i <= len(c.ws)
        |              AND x[1][1] - i >= 1 AND x[1][1] - i <= len(r.ws)
        |            THEN greatest(acc[1][i + 1], acc[1][i],
        |              acc[2][i] + CASE WHEN c.ws[i] = r.ws[x[1][1] - i]
        |                THEN 1 ELSE 0 END)
        |            ELSE CAST(0 AS BIGINT) END),
        |        acc[1]]
        |    )[1][len(c.ws) + 1] AS lcs
        |  FROM p JOIN w c ON c.doc_id = p.cand_id
        |  JOIN w r ON r.doc_id = p.ref_id),
        |f AS (SELECT source, lcs,
        |    CAST(lcs * 1000000 // nc AS BIGINT) AS p_ppm,
        |    CAST(lcs * 1000000 // nr AS BIGINT) AS r_ppm,
        |    CAST(2 * lcs * 1000000 // (nc + nr) AS BIGINT) AS f_ppm
        |  FROM lc)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(lcs) AS BIGINT) AS sum_lcs,
        |  CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS mean_p_ppm,
        |  CAST(SUM(r_ppm) // COUNT(*) AS BIGINT) AS mean_r_ppm,
        |  CAST(SUM(f_ppm) // COUNT(*) AS BIGINT) AS mean_f_ppm
        |FROM f GROUP BY 1 ORDER BY source""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val p = d.select(col("source"), col("doc_id").as("cand_id"),
          lag(col("doc_id"), 1).over(Window.partitionBy(col("source"))
            .orderBy(col("doc_id"))).as("ref_id"))
        .filter(col("ref_id").isNotNull && col("cand_id") % 5 === 0)
      val w = d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      p.join(w.select(col("doc_id").as("cand_id"),
          col("ws").as("cws")), Seq("cand_id"))
        .join(w.select(col("doc_id").as("ref_id"),
          col("ws").as("rws")), Seq("ref_id"))
        .select(col("source"),
          size(col("cws")).cast("long").as("nc"),
          size(col("rws")).cast("long").as("nr"),
          // native codegen'd DP kernel; the oracle's anti-diagonal
          // list_reduce is the executable spec it is hash-checked
          // against (two independent implementations must agree)
          graft.functions.LcsLen.lcs_len(col("cws"), col("rws"))
            .as("lcs"))
        .select(col("source"), col("lcs"),
          expr("CAST(lcs * 1000000 div nc AS BIGINT)").as("p_ppm"),
          expr("CAST(lcs * 1000000 div nr AS BIGINT)").as("r_ppm"),
          expr("CAST(2 * lcs * 1000000 div (nc + nr) AS BIGINT)")
            .as("f_ppm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("lcs")).cast("long").as("sum_lcs"),
          expr("CAST(SUM(p_ppm) div COUNT(*) AS BIGINT)")
            .as("mean_p_ppm"),
          expr("CAST(SUM(r_ppm) div COUNT(*) AS BIGINT)")
            .as("mean_r_ppm"),
          expr("CAST(SUM(f_ppm) div COUNT(*) AS BIGINT)")
            .as("mean_f_ppm"))
        .orderBy(col("source"))
    },

    // chrF2 over the same adjacent candidate↔reference pairs — the
    // third member of the MT-eval triad (BLEU: clipped word-n-gram
    // precision; ROUGE-L: subsequence recall; chrF: CHARACTER-n-gram
    // F-score, the metric of the three that is robust to tokenization
    // and morphology). Whitespace is removed (the sacrebleu default),
    // char 2- and 3-gram multisets are counted per doc, clipped
    // matches come from the same doc-keyed hash joins as
    // eval_bleu_pairs' m2 (over the same 20% eval sample as
    // eval_rouge_l), and P/R macro-average the two gram orders
    // as exact ppm integers; chrF2's β = 2 folds as the exact
    // rational 5·P·R // (4·P + R) over those ppms — no float
    // anywhere. Corpus-scale work is two hash aggregates over the
    // exploded gram table (uniform doc_id keys); pairs never carry
    // text, only counts.
    QuerySpec.sql(
      "eval_chrf", {
        def grams(n: Int) =
          s"""SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
             |    SELECT doc_id, t[i:i+${n - 1}] AS g
             |    FROM (SELECT doc_id, replace(text, ' ', '') AS t
             |          FROM documents) d,
             |      LATERAL (SELECT UNNEST(generate_series(1,
             |        len(t) - ${n - 1})) AS i) s
             |    WHERE len(t) >= $n)
             |  GROUP BY 1, 2""".stripMargin
        s"""WITH pr AS (
           |  SELECT source, doc_id AS cand_id,
           |    LAG(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
           |      AS ref_id
           |  FROM documents),
           |p AS (SELECT * FROM pr
           |  WHERE ref_id IS NOT NULL AND cand_id % 5 = 0),
           |g2 AS (${grams(2)}),
           |g3 AS (${grams(3)}),
           |gl2 AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS len
           |  FROM g2 GROUP BY 1),
           |gl3 AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS len
           |  FROM g3 GROUP BY 1),
           |m2 AS (
           |  SELECT p.cand_id, CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT)
           |    AS clip
           |  FROM p JOIN g2 c ON c.doc_id = p.cand_id
           |  JOIN g2 r ON r.doc_id = p.ref_id AND r.g = c.g
           |  GROUP BY 1),
           |m3 AS (
           |  SELECT p.cand_id, CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT)
           |    AS clip
           |  FROM p JOIN g3 c ON c.doc_id = p.cand_id
           |  JOIN g3 r ON r.doc_id = p.ref_id AND r.g = c.g
           |  GROUP BY 1),
           |f AS (
           |  SELECT p.source,
           |    (COALESCE(m2.clip, 0) * 1000000 // c2.len
           |      + COALESCE(m3.clip, 0) * 1000000 // c3.len) // 2
           |      AS p_ppm,
           |    (COALESCE(m2.clip, 0) * 1000000 // r2.len
           |      + COALESCE(m3.clip, 0) * 1000000 // r3.len) // 2
           |      AS r_ppm
           |  FROM p
           |  JOIN gl2 c2 ON c2.doc_id = p.cand_id
           |  JOIN gl3 c3 ON c3.doc_id = p.cand_id
           |  JOIN gl2 r2 ON r2.doc_id = p.ref_id
           |  JOIN gl3 r3 ON r3.doc_id = p.ref_id
           |  LEFT JOIN m2 ON m2.cand_id = p.cand_id
           |  LEFT JOIN m3 ON m3.cand_id = p.cand_id)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |  CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS mean_p_ppm,
           |  CAST(SUM(r_ppm) // COUNT(*) AS BIGINT) AS mean_r_ppm,
           |  CAST(SUM(CASE WHEN 4 * p_ppm + r_ppm > 0 THEN
           |      5 * p_ppm * r_ppm // (4 * p_ppm + r_ppm)
           |    ELSE 0 END) // COUNT(*) AS BIGINT) AS mean_chrf2_ppm
           |FROM f GROUP BY 1 ORDER BY source""".stripMargin
      }) { (s, dir) =>
      val d = docs(s, dir)
      val p = d.select(col("source"), col("doc_id").as("cand_id"),
          lag(col("doc_id"), 1).over(Window.partitionBy(col("source"))
            .orderBy(col("doc_id"))).as("ref_id"))
        .filter(col("ref_id").isNotNull && col("cand_id") % 5 === 0)
      // native per-pair kernel instead of the declarative gram
      // pipeline: the exploded-gram build costs an interpreted lambda
      // + struct alloc per character position (~4 s at sf0.1 before
      // any join — HOF lambdas are not codegen'd) and shuffles
      // corpus-scale gram tables for a per-PAIR statistic; ChrfClip
      // walks each pair's two strings once with a small hash map, so
      // the gate is bounded by the PAIR count (the DuckDB oracle
      // keeps the gram-table spelling — the hash compare pins two
      // independent implementations, the LcsLen discipline)
      val txt = d.select(col("doc_id"),
        regexp_replace(col("text"), " ", "").as("t"))
      p.join(txt.select(col("doc_id").as("cand_id"),
          col("t").as("ct")), Seq("cand_id"))
        .join(txt.select(col("doc_id").as("ref_id"),
          col("t").as("rt")), Seq("ref_id"))
        .filter(length(col("ct")) >= 3 && length(col("rt")) >= 3)
        .select(col("source"),
          graft.functions.ChrfClip.chrf_clip(col("ct"), col("rt"), 2)
            .as("clip2"),
          graft.functions.ChrfClip.chrf_clip(col("ct"), col("rt"), 3)
            .as("clip3"),
          (length(col("ct")) - 1).cast("long").as("c2len"),
          (length(col("ct")) - 2).cast("long").as("c3len"),
          (length(col("rt")) - 1).cast("long").as("r2len"),
          (length(col("rt")) - 2).cast("long").as("r3len"))
        .select(col("source"),
          expr("(clip2 * 1000000 div c2len " +
            "+ clip3 * 1000000 div c3len) div 2").as("p_ppm"),
          expr("(clip2 * 1000000 div r2len " +
            "+ clip3 * 1000000 div r3len) div 2").as("r_ppm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("CAST(SUM(p_ppm) div COUNT(*) AS BIGINT)")
            .as("mean_p_ppm"),
          expr("CAST(SUM(r_ppm) div COUNT(*) AS BIGINT)")
            .as("mean_r_ppm"),
          expr("CAST(SUM(CASE WHEN 4 * p_ppm + r_ppm > 0 THEN " +
            "5 * p_ppm * r_ppm div (4 * p_ppm + r_ppm) " +
            "ELSE 0 END) div COUNT(*) AS BIGINT)")
            .as("mean_chrf2_ppm"))
        .orderBy(col("source"))
    },

    // DeLong variance + significance for the ROC-AUC — the
    // companion eval_score_auc owes its consumers: is this AUC
    // DISTINGUISHABLE from a coin flip? The per-positive placement
    // values V10 (fraction of negatives scored below, ties half) are
    // carried in the ×2n0 integer domain off the SAME score
    // histogram, so Σ V and Σ V² are exact; the two DeLong variance
    // components quantize to pico with DECIMAL(38,0)/HUGEINT
    // numerators, and the 95% verdict cross-multiplies
    // 1.96² = 2401/625 against the exact integers (no float in the
    // decision). The reported z is the ONE shared-double expression
    // (IEEE sqrt is correctly rounded — bit-identical cross-engine).
    // Plan: one tokenize+score pass, the PrefixSum histogram
    // cumulative, one scalar fold.
    QuerySpec.sql(
      "eval_auc_delong",
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) AS score
         |  FROM q),
         |s AS (
         |  SELECT score, CAST(SUM(pos) AS BIGINT) AS c1,
         |    CAST(COUNT(*) - SUM(pos) AS BIGINT) AS c0
         |  FROM sc GROUP BY 1),
         |r AS (SELECT score, c1, c0,
         |    COALESCE(SUM(c1) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cb1,
         |    COALESCE(SUM(c0) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cb0
         |  FROM s),
         |g AS (SELECT
         |    CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c0) AS BIGINT) AS n0,
         |    CAST(SUM(c1 * (2 * cb0 + c0)) AS BIGINT) AS sv1,
         |    CAST(SUM(CAST(c1 AS HUGEINT) * (2 * cb0 + c0)
         |      * (2 * cb0 + c0)) AS HUGEINT) AS sv1sq,
         |    CAST(SUM(c0 * (2 * cb1 + c1)) AS BIGINT) AS sv0,
         |    CAST(SUM(CAST(c0 AS HUGEINT) * (2 * cb1 + c1)
         |      * (2 * cb1 + c1)) AS HUGEINT) AS sv0sq
         |  FROM r),
         |v AS (SELECT n1, n0,
         |    CAST(CAST(sv1 AS HUGEINT) * 1000000
         |      // (2 * CAST(n1 AS HUGEINT) * n0) AS BIGINT)
         |      AS auc_micro,
         |    CAST(CASE WHEN n1 > 1 AND n0 > 1 THEN
         |      (CAST(n1 AS HUGEINT) * sv1sq
         |        - CAST(sv1 AS HUGEINT) * sv1) * 1000000000000
         |      // (CAST(n1 AS HUGEINT) * n1 * (n1 - 1) * 4 * n0 * n0)
         |      + (CAST(n0 AS HUGEINT) * sv0sq
         |        - CAST(sv0 AS HUGEINT) * sv0) * 1000000000000
         |      // (CAST(n0 AS HUGEINT) * n0 * (n0 - 1) * 4 * n1 * n1)
         |      ELSE 0 END AS BIGINT) AS var_pico
         |  FROM g)
         |SELECT n1 AS n_pos, n0 AS n_neg, auc_micro, var_pico,
         |  CASE WHEN var_pico > 0 THEN
         |    (CAST(auc_micro AS DOUBLE) - 500000)
         |    / sqrt(CAST(var_pico AS DOUBLE)) END AS z,
         |  CASE WHEN var_pico > 0 AND auc_micro > 500000
         |      AND CAST(625 AS HUGEINT)
         |        * (auc_micro - 500000) * (auc_micro - 500000)
         |        > CAST(2401 AS HUGEINT) * var_pico
         |    THEN 'above_chance' ELSE 'not_significant' END
         |    AS verdict
         |FROM v""".stripMargin) { (s, dir) =>
      import graft.functions.PrefixSum
      val hist = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CAST((3 * n_stop + 7 * n_distinct) * 1000000 div " +
            "(10 * n_tokens) AS BIGINT)").as("score"))
        .groupBy(col("score"))
        .agg(sum(col("pos")).as("c1"),
          (count(lit(1)) - sum(col("pos"))).as("c0"))
      val r = PrefixSum.globalCumsumMulti(hist, Seq(col("score")),
          Seq(col("c1") -> "cum1", col("c0") -> "cum0"))
        .withColumn("cb1", col("cum1") - col("c1"))
        .withColumn("cb0", col("cum0") - col("c0"))
      val g = r.agg(
        sum(col("c1")).cast("long").as("n1"),
        sum(col("c0")).cast("long").as("n0"),
        sum(col("c1") * (lit(2) * col("cb0") + col("c0")))
          .cast("long").as("sv1"),
        sum(expr("CAST(c1 AS DECIMAL(38,0)) * (2 * cb0 + c0) " +
          "* (2 * cb0 + c0)"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("sv1sq"),
        sum(col("c0") * (lit(2) * col("cb1") + col("c1")))
          .cast("long").as("sv0"),
        sum(expr("CAST(c0 AS DECIMAL(38,0)) * (2 * cb1 + c1) " +
          "* (2 * cb1 + c1)"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("sv0sq"))
      g.select(col("n1"), col("n0"),
          expr("CAST(CAST(sv1 AS DECIMAL(38,0)) * 1000000 div " +
            "(2 * CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)")
            .as("auc_micro"),
          expr("""CAST(CASE WHEN n1 > 1 AND n0 > 1 THEN
            |  (CAST(n1 AS DECIMAL(38,0)) * sv1sq
            |    - CAST(sv1 AS DECIMAL(38,0)) * sv1) * 1000000000000
            |  div (CAST(n1 AS DECIMAL(38,0)) * n1 * (n1 - 1)
            |    * 4 * n0 * n0)
            |  + (CAST(n0 AS DECIMAL(38,0)) * sv0sq
            |    - CAST(sv0 AS DECIMAL(38,0)) * sv0) * 1000000000000
            |  div (CAST(n0 AS DECIMAL(38,0)) * n0 * (n0 - 1)
            |    * 4 * n1 * n1)
            |  ELSE 0 END AS BIGINT)""".stripMargin).as("var_pico"))
        .select(col("n1").as("n_pos"), col("n0").as("n_neg"),
          col("auc_micro"), col("var_pico"),
          expr("CASE WHEN var_pico > 0 THEN " +
            "(CAST(auc_micro AS DOUBLE) - 500000) " +
            "/ sqrt(CAST(var_pico AS DOUBLE)) END").as("z"),
          expr("CASE WHEN var_pico > 0 AND auc_micro > 500000 " +
            "AND CAST(625 AS DECIMAL(38,0)) " +
            "* (auc_micro - 500000) * (auc_micro - 500000) " +
            "> CAST(2401 AS DECIMAL(38,0)) * var_pico " +
            "THEN 'above_chance' ELSE 'not_significant' END")
            .as("verdict"))
    },

    // Heaps'-law fit — the vocabulary-growth EXPONENT (V = K·N^β)
    // behind every tokenizer-vocab-size decision, fit cross-
    // sectionally over (ln tokens, ln types) per document by the
    // shared-LinReg discipline: both lns micro-quantized by the ONE
    // shared round(ln·10⁶) text, every OLS sufficient statistic an
    // exact integer, slope and intercept folded in DECIMAL(38,0)
    // with the intercept's β·Sx product TWO-STEP-divided (via
    // beta_ppm) so nothing passes 38 digits even at 10⁷ documents.
    // Complements text_vocab_growth (the curve) and text_zipf_fit
    // (the frequency law) with the growth law's parameters. Plan:
    // one per-row pass (no explode — token/type counts are array
    // ops), one scalar fold.
    QuerySpec.sql(
      "text_heaps_fit",
      """WITH q AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    CAST(len(list_distinct(string_split(text, ' ')))
        |      AS BIGINT) AS nv
        |  FROM documents),
        |l AS (
        |  SELECT
        |    CAST(round(ln(CAST(nt AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS x,
        |    CAST(round(ln(CAST(nv AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS y
        |  FROM q WHERE nt >= 1 AND nv >= 1),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS sx,
        |    CAST(SUM(y) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        |  FROM l),
        |b AS (SELECT n, sx, sy,
        |    CASE WHEN n * sxx - sx * sx > 0 THEN
        |      (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
        |    END AS beta_ppm
        |  FROM a)
        |SELECT n AS n_docs, CAST(beta_ppm AS BIGINT) AS beta_ppm,
        |  CAST(CASE WHEN beta_ppm IS NOT NULL THEN
        |    (sy - beta_ppm * sx // 1000000) // n END AS BIGINT)
        |    AS alpha_micro_ln
        |FROM b""".stripMargin) { (s, dir) =>
      val l = docs(s, dir)
        .select(size(split(col("text"), " ")).cast("long").as("nt"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("nv"))
        .filter(col("nt") >= 1 && col("nv") >= 1)
        .select(
          expr("CAST(round(ln(CAST(nt AS DOUBLE)) * 1000000) " +
            "AS BIGINT)").as("x"),
          expr("CAST(round(ln(CAST(nv AS DOUBLE)) * 1000000) " +
            "AS BIGINT)").as("y"))
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      l.agg(count(lit(1)).as("n"),
          sum(col("x")).cast(dec).as("sx"),
          sum(col("y")).cast(dec).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast(dec)
            .as("sxx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast(dec)
            .as("sxy"))
        .withColumn("beta_ppm",
          expr("CASE WHEN n * sxx - sx * sx > 0 THEN " +
            "(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) " +
            "END"))
        .select(col("n").as("n_docs"),
          col("beta_ppm").cast("long").as("beta_ppm"),
          expr("CAST(CASE WHEN beta_ppm IS NOT NULL THEN " +
            "(sy - beta_ppm * sx div 1000000) div n END AS BIGINT)")
            .as("alpha_micro_ln"))
    },

    // EXACT isotonic calibration of the score's reliability table —
    // pool-adjacent-violators without the sequential pooling loop:
    // the PAV fit at bin i equals the minimax identity
    // max_{j≤i} min_{k≥i} avg(pos rate over bins j..k), which turns
    // the classically-iterative algorithm into three joins over the
    // 10-row bin frame (≤10³ combinations, bounded by construction
    // whatever the corpus size). Range averages come from prefix
    // sums, each quantized once to ppm with shared truncation — the
    // fitted monotone curve hash-compares, giving the calibration
    // MAP eval_calibration_bins only diagnoses. Windows run over the
    // ≤10-row bin table only (bounded like the ranking-eval pair).
    QuerySpec.sql(
      "eval_isotonic_calibration",
      s"""WITH q AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN tok IN ${inList(langMarkers.head._2)}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |    COUNT(DISTINCT tok) AS n_distinct
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    CAST((3 * n_stop + 7 * n_distinct) * 1000000
         |      // (10 * n_tokens) AS BIGINT) AS score
         |  FROM q),
         |b AS (
         |  SELECT LEAST(score // 100000, 9) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(pos) AS BIGINT) AS n_pos
         |  FROM sc GROUP BY 1),
         |o AS (SELECT bin, n, n_pos,
         |    CAST(ROW_NUMBER() OVER (ORDER BY bin) AS BIGINT) AS i
         |  FROM b),
         |c AS (SELECT o.*,
         |    CAST(SUM(n) OVER (ORDER BY i) AS BIGINT) AS cn,
         |    CAST(SUM(n_pos) OVER (ORDER BY i) AS BIGINT) AS cp
         |  FROM o),
         |pr AS (
         |  SELECT j.i AS j, k.i AS k,
         |    (k.cp - j.cp + j.n_pos) * 1000000
         |      // (k.cn - j.cn + j.n) AS a
         |  FROM c j JOIN c k ON k.i >= j.i),
         |t AS (
         |  SELECT m.i AS i, pr.j AS j, MIN(pr.a) AS mn
         |  FROM c m JOIN pr ON pr.j <= m.i AND pr.k >= m.i
         |  GROUP BY 1, 2),
         |iso AS (SELECT i, CAST(MAX(mn) AS BIGINT) AS iso_ppm
         |  FROM t GROUP BY 1)
         |SELECT CAST(c.bin AS BIGINT) AS bin, c.n, c.n_pos,
         |  CAST(c.n_pos * 1000000 // c.n AS BIGINT) AS acc_ppm,
         |  iso.iso_ppm
         |FROM c JOIN iso ON iso.i = c.i
         |ORDER BY bin""".stripMargin) { (s, dir) =>
      val cum = Window.orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val b = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("ts"))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr(s"CAST(size(filter(ts, t -> t IN " +
            s"${inList(langMarkers.head._2)})) AS BIGINT)").as("n_stop"),
          size(array_distinct(col("ts"))).cast("long").as("n_distinct"))
        .select(col("pos"),
          expr("CAST((3 * n_stop + 7 * n_distinct) * 1000000 div " +
            "(10 * n_tokens) AS BIGINT)").as("score"))
        .groupBy(least(expr("score div 100000"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      val c = b
        .withColumn("i",
          row_number().over(Window.orderBy(col("bin"))).cast("long"))
        .withColumn("cn", sum(col("n")).over(cum).cast("long"))
        .withColumn("cp", sum(col("n_pos")).over(cum).cast("long"))
      val j = c.select(col("i").as("j"), col("cp").as("jcp"),
        col("cn").as("jcn"), col("n_pos").as("jnp"),
        col("n").as("jn"))
      val k = c.select(col("i").as("k"), col("cp").as("kcp"),
        col("cn").as("kcn"))
      val pr = j.join(k, col("k") >= col("j"))
        .select(col("j"), col("k"),
          expr("(kcp - jcp + jnp) * 1000000 div (kcn - jcn + jn)")
            .as("a"))
      val iso = c.select(col("i"))
        .join(pr, col("j") <= col("i") && col("k") >= col("i"))
        .groupBy(col("i"), col("j"))
        .agg(min(col("a")).as("mn"))
        .groupBy(col("i"))
        .agg(max(col("mn")).cast("long").as("iso_ppm"))
      c.join(iso, Seq("i"))
        .select(col("bin").cast("long").as("bin"), col("n"),
          col("n_pos"),
          expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("acc_ppm"),
          col("iso_ppm"))
        .orderBy(col("bin"))
    })

  /** Fixed NDCG discount table, rank 1–10: round(10^6 / log2(r+1)).
    * A LITERAL shared between the Spark plan and the DuckDB oracle so
    * the rank math is float-free at runtime in both engines.
    */
  private val ndcgDisc: Seq[(Long, Long)] = Seq(
    1L -> 1000000L, 2L -> 630930L, 3L -> 500000L, 4L -> 430677L,
    5L -> 386853L, 6L -> 356207L, 7L -> 333333L, 8L -> 315465L,
    9L -> 301030L, 10L -> 289065L)

  private val ndcgDiscSql: String =
    ndcgDisc.map { case (r, d) => s"($r, $d)" }.mkString(", ")

  /** Shared retrieval CTEs for the ranking-eval gates: the
    * text_bm25_topk scorer verbatim (same literal constants) reduced
    * to `ret(rnk, doc_id)` over the top 10, plus `relv(doc_id, rel)`
    * — the graded relevance (distinct query terms contained, 0–3)
    * for EVERY document (the ideal-ranking / recall denominator).
    */
  private val rankEvalCte: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      |  FROM toks GROUP BY 1),
      |scal AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |  CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
      |tfq AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM toks WHERE tok IN ('hash', 'join', 'spark')
      |  GROUP BY 1, 2),
      |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
      |  FROM tfq GROUP BY 1),
      |sc AS (
      |  SELECT tfq.doc_id,
      |    (CAST(round(ln(1 + (nd - df + 0.5) / (df + 0.5)) * 1e6)
      |        AS BIGINT) * 22 * tf * tt)
      |      // (10 * tf * tt + 3 * tt + 9 * dl * nd) AS s
      |  FROM tfq JOIN dfq USING (tok) JOIN dl USING (doc_id)
      |  CROSS JOIN scal),
      |bm AS (
      |  SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_micros
      |  FROM sc GROUP BY doc_id
      |  ORDER BY score_micros DESC, doc_id LIMIT 10),
      |ret AS (
      |  SELECT doc_id, ROW_NUMBER() OVER
      |    (ORDER BY score_micros DESC, doc_id) AS rnk
      |  FROM bm),
      |relv AS (
      |  SELECT d.doc_id, CAST(COALESCE(r.rel, 0) AS BIGINT) AS rel
      |  FROM (SELECT DISTINCT doc_id FROM documents) d
      |  LEFT JOIN (SELECT doc_id, COUNT(DISTINCT tok) AS rel
      |             FROM tfq GROUP BY 1) r
      |  ON r.doc_id = d.doc_id)""".stripMargin

  /** Spark side of [[rankEvalCte]]: (`ret(rnk, doc_id)`,
    * `relv(doc_id, rel)`). The scorer is the text_bm25_topk plan
    * (broadcast df + corpus scalars, hash-agg per doc, TakeOrdered
    * top-10); the 10-row rank window is bounded by construction.
    */
  private def rankEval(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))
    val scal = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tt"))
    val tfq = toks.filter(col("tok").isin("hash", "join", "spark"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val bm = tfq.join(broadcast(dfq), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(scal))
      .select(col("doc_id"),
        expr("""(CAST(round(ln(1 + (nd - df + 0.5) / (df + 0.5)) * 1e6)
               |    AS BIGINT) * 22 * tf * tt)
               |  div (10 * tf * tt + 3 * tt + 9 * dl * nd)""".stripMargin)
          .as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).cast("long").as("score_micros"))
      .orderBy(col("score_micros").desc, col("doc_id"))
      .limit(10)
    val ret = bm
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("score_micros").desc,
          col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rnk"))
    val relv = docs(s, dir).select(col("doc_id")).distinct()
      .join(tfq.groupBy(col("doc_id"))
          .agg(countDistinct(col("tok")).as("rel0")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rel0"), lit(0L)).cast("long").as("rel"))
    (ret, relv)
  }

  /** Per-(unit, category) rating counts n_uc of the THREE
    * deterministic length annotators — the eval_fleiss_kappa rater
    * frame, shared by the other chance-corrected agreement gates
    * (eval_krippendorff_alpha, eval_gwet_ac1). Thresholds are
    * verbatim fleiss' (char / token / distinct-token terciles).
    */
  private def raterNij(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        when(col("n_chars") < 200, 0L)
          .when(col("n_chars") < 350, 1L).otherwise(2L).as("r1"),
        when(size(split(col("text"), " ")) < 37, 0L)
          .when(size(split(col("text"), " ")) < 64, 1L)
          .otherwise(2L).as("r2"),
        when(size(array_distinct(split(col("text"), " "))) < 19, 0L)
          .when(size(array_distinct(split(col("text"), " "))) < 33,
            1L).otherwise(2L).as("r3"))
      .select(col("doc_id"),
        explode(array(col("r1"), col("r2"), col("r3"))).as("cat"))
      .groupBy(col("doc_id"), col("cat"))
      .agg(count(lit(1)).as("nij"))

  /** DuckDB mirror of [[raterNij]] — CTEs `r` then `nij` (expects to
    * open a WITH list); the rater CASEs are the fleiss text verbatim.
    */
  private val ratersNijSql =
    """r AS (
      |  SELECT doc_id,
      |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 350 THEN 1
      |      ELSE 2 END AS r1,
      |    CASE WHEN len(string_split(text, ' ')) < 37 THEN 0
      |      WHEN len(string_split(text, ' ')) < 64 THEN 1 ELSE 2
      |      END AS r2,
      |    CASE WHEN len(list_distinct(string_split(text, ' '))) < 19
      |        THEN 0
      |      WHEN len(list_distinct(string_split(text, ' '))) < 33
      |        THEN 1 ELSE 2 END AS r3
      |  FROM documents),
      |nij AS (
      |  SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS nij
      |  FROM (SELECT doc_id, unnest([r1, r2, r3]) AS cat FROM r)
      |  GROUP BY 1, 2)""".stripMargin
}
