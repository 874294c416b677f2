package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Cols._
import graft.functions.Materialize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series aggregations over the `events` stream table, modeling the
  * reference's incremental aggregation daemons
  * (lib/aggregation/{exchanges,payments,accountPayments,stats,fees}.js).
  *
  * Batch forms here; streaming variants live in graft.streaming. OHLC
  * open/close use `min_by`/`max_by` against a unique monotonic key
  * (event_id ≡ the reference's ledger|tx|node composite sort key,
  * lib/aggregation/exchanges.js:540-566) — no global sort required, and
  * candle merge stays associative so the interval cascade (1h → 1d) can
  * re-reduce child candles exactly like exchanges.js:282-359.
  *
  * The `props` JSON-string column mirrors the reference's stringified
  * JSON cells (lib/hbase/hbase-thrift/index.js:1021-1024): weight `k`
  * is extracted at query time with get_json_object.
  */
object TimeSeriesOps {

  /** Shared OLS closed-form expression TEXT for ts_linreg_trend —
    * compiled by BOTH engines over the identical sufficient-statistic
    * columns (n, sx, sxx: exact integers; sy, sxy, syy: decimal-exact
    * doubles), so every double op runs in the same IEEE order and the
    * results agree bit-for-bit. Guards keep a degenerate series
    * (single day / constant value) NULL instead of ±inf.
    */
  private[operators] object LinReg {
    private val num =
      "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    private val denx =
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    private val deny = "(CAST(n AS DOUBLE) * syy - sy * sy)"
    val slope = s"CASE WHEN $denx <> 0 THEN $num / $denx END"
    val intercept =
      s"CASE WHEN $denx <> 0 THEN (sy - $num / $denx * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END"
    val r2 =
      s"CASE WHEN $denx <> 0 AND $deny <> 0 THEN $num * $num / ($denx * $deny) END"
  }

  /** Shared Pearson-r expression text for ts_autocorr1 (same
    * bit-exactness contract as [[LinReg]]: exact long inputs,
    * identical IEEE op order in both engines).
    */
  private object AutoCorr {
    private val num =
      "(CAST(np AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))"
    private val va =
      "(CAST(np AS DOUBLE) * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
    private val vb =
      "(CAST(np AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))"
    val r = s"CASE WHEN $va > 0 AND $vb > 0 THEN $num / (sqrt($va) * sqrt($vb)) END"
  }

  /** Shared Spearman-rho expression text for stats_spearman — Pearson
    * over exact ×2-scaled tie-averaged ranks (same bit-exactness
    * contract as [[AutoCorr]]: the rank sums are exact BIGINTs, the
    * cross terms run in double in the identical IEEE op order, exact
    * while the sums stay under 2^53 — n≈2·10⁵ per group; groups here
    * are type-days, 739 max at sf0.1).
    */
  private object Spearman {
    private val num =
      "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    private val vx =
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    private val vy =
      "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    val rho =
      s"CASE WHEN $vx > 0 AND $vy > 0 THEN $num / (sqrt($vx) * sqrt($vy)) END"
  }

  /** Shared difference-in-differences expression text for
    * stats_diff_in_diff — cell sums are decimal-exact doubles, counts
    * BIGINT, so the divisions/subtractions run in the identical IEEE
    * op order in both engines (the [[LinReg]] contract).
    */
  private object DiD {
    def mean(c: String): String = s"(CASE WHEN n$c > 0 THEN s$c / n$c END)"
    val effect: String =
      "(CASE WHEN n00 > 0 AND n01 > 0 AND n10 > 0 AND n11 > 0 THEN " +
        "(s11 / n11 - s10 / n10) - (s01 / n01 - s00 / n00) END)"
  }

  /** Shared seasonal/trend-strength expression text for
    * ts_seasonal_strength (Hyndman F = max(0, 1 − Var_r/Var_c)) — the
    * [[AutoCorr]] contract: exact integer/decimal sums in, identical
    * IEEE op order in both engines. `q`/`sv` name the component's
    * power-sum columns; resid sums are fixed (q_r, s_r).
    */
  private object Strength {
    private def v(q: String, sv: String) =
      s"(CAST(n AS DOUBLE) * $q - CAST($sv AS DOUBLE) * CAST($sv AS DOUBLE))"
    def expr(q: String, sv: String): String =
      s"(CASE WHEN ${v(q, sv)} > 0 THEN GREATEST(CAST(0 AS DOUBLE), " +
        s"1 - ${v("q_r", "s_r")} / ${v(q, sv)}) END)"
  }

  /** Classical decomposition shared by ts_seasonal_decompose and
    * ts_seasonal_strength: 7-day centered moving-average trend (exact
    * integer micros), day-of-week seasonal means over the detrended
    * deviations, all floor-division arithmetic (bit-identical in both
    * engines). Returns one row per (event_type, day) with n_events,
    * trend_micros, dev_micros, dow, seasonal_micros.
    */
  private def decomposed(s: SparkSession, dir: String): DataFrame = {
    val trended = events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dnum",
        datediff(col("day"), lit("1970-01-01")).cast("long"))
      .withColumn("trend_micros", expr(
        "(1000000L * sum(n_events) OVER (PARTITION BY event_type ORDER BY dnum RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)) div count(1) OVER (PARTITION BY event_type ORDER BY dnum RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)"))
    val dev = trended
      .withColumn("dev_micros",
        lit(1000000L) * col("n_events") - col("trend_micros"))
      .withColumn("dow", col("dnum") % 7)
    val seasonal = dev.groupBy(col("event_type"), col("dow"))
      .agg(expr("sum(dev_micros) div count(1)").as("seasonal_micros"))
    dev.join(seasonal, Seq("event_type", "dow"))
  }

  /** Day-index points for the OLS trend: (event_type, x, value). */
  private[graft] def linregPoints(ev: DataFrame): DataFrame =
    ev.withColumn("x", datediff(to_date(col("ts")), lit("1970-01-01")))

  /** One-pass sufficient statistics for the OLS trend. Works unchanged
    * over a STREAMING frame (plain keyed aggregation — each statistic
    * is associative and the value sums decimal-exact, so the streaming
    * state-store accumulation equals the batch fold bit-for-bit; see
    * graft.streaming.LinRegStream).
    */
  private[graft] def linregStats(pts: DataFrame): DataFrame =
    pts.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        widedsum(col("value")).as("sy"),
        widedsum(col("value") * col("x")).as("sxy"),
        widedsum(col("value") * col("value")).as("syy"))

  /** Closed-form slope/intercept/R² over the sufficient statistics. */
  private[graft] def linregClosedForm(stats: DataFrame): DataFrame =
    stats.select(col("event_type"), col("n"),
        expr(LinReg.slope).as("slope"),
        expr(LinReg.intercept).as("intercept"),
        expr(LinReg.r2).as("r2"))
      .orderBy(col("event_type"))

  /** The events frame (JSON weight parsed, `ts` normalized by
    * Tables.events) for sibling operator objects.
    */
  private[operators] def eventsFrame(s: SparkSession, dir: String): DataFrame =
    events(s, dir)

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))

  private val oracleEvents =
    "(SELECT *, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)"

  /** Hourly OHLC candle aggregation (A1; exchanges.js:515-582). */
  private def hourlyCandles(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(
        col("event_type"),
        to_date(col("ts")).as("day"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max_by(col("value"), col("event_id")).as("close"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        dsum(col("value")).as("volume"),
        dsum(col("value") * col("k")).as("notional"),
        dsum(col("k")).as("k_vol"),
        count(lit(1)).as("n"))
      // vwap = Σ(value·k)/Σk, guarded: ANSI mode (and DuckDB) error on /0.
      .withColumn("vwap",
        when(col("k_vol") =!= 0d, col("notional") / col("k_vol")))

  private val hourlyCandlesSql =
    s"""SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       |  min_by(value, event_id) AS open, max_by(value, event_id) AS close,
       |  max(value) AS high, min(value) AS low,
       |  ${dsumSql("value")} AS volume,
       |  ${dsumSql("value * k")} AS notional,
       |  ${dsumSql("k")} AS k_vol,
       |  COUNT(*) AS n,
       |  CASE WHEN ${dsumSql("k")} <> 0 THEN
       |    ${dsumSql("value * k")} / ${dsumSql("k")} END AS vwap
       |FROM $oracleEvents
       |GROUP BY 1, 2, 3""".stripMargin


  // ---- gap-aware daily series (gap fill / interpolation / anomaly) ----

  /** Sparse daily series: decimal-exact daily totals of the value>200
    * tail — deliberately gappy, so the fill operators have real work.
    */
  private def sparseDaily(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("value") > 200)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("total"))

  /** Per-series dense calendar LEFT-joined to the sparse series: one
    * row per (event_type, day in [min, max]), total null on gap days.
    * The calendar explode is per-series bounded metadata (30 rows per
    * series here; one row per day at any scale) — never a per-event
    * blowup.
    */
  private def calendarJoined(s: SparkSession, dir: String): DataFrame = {
    val daily = sparseDaily(s, dir)
    val cal = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    cal.join(daily, Seq("event_type", "day"), "left")
  }

  private val sparseDailySql =
    s"""SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       |  ${dsumSql("value")} AS total
       |FROM events WHERE value > 200 GROUP BY 1, 2""".stripMargin

  private val calendarJoinedSql =
    s"""WITH daily AS ($sparseDailySql),
       |cal AS (
       |  SELECT b.event_type, CAST(g AS DATE) AS day
       |  FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
       |        FROM daily GROUP BY 1) b,
       |    UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS t(g)),
       |j AS (
       |  SELECT c.event_type, c.day, d.total
       |  FROM cal c LEFT JOIN daily d
       |    ON d.event_type = c.event_type AND d.day = c.day)""".stripMargin

  /** Rolling z-score flags over a daily-count frame
    * (event_type, day, n_events) — shared by the batch gate and the
    * streaming pipeline (graft.streaming.AnomalyStream feeds its
    * incrementally-maintained daily counts through this exact query).
    * Integer-only test: see the ts_anomaly_zscore gate comment.
    */
  private[graft] def anomalyFlags(daily: DataFrame): DataFrame = {
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    daily
      .withColumn("s", sum(col("n_events")).over(w7))
      .withColumn("q", sum(col("n_events") * col("n_events")).over(w7))
      .withColumn("win_n", count(lit(1)).over(w7))
      .select(col("event_type"), col("day"), col("n_events"), col("win_n"),
        (col("win_n") >= 4 &&
          (col("win_n") * col("n_events") - col("s")) *
            (col("win_n") * col("n_events") - col("s")) >
            lit(4L) * (col("win_n") * col("q") - col("s") * col("s")))
          .as("is_anomaly"))
  }

  /** Hard bound on the per-series sequential folds (ewma / holt /
    * cusum): the collected series is calendar-bounded by construction
    * (one element per (event_type, day) — ~274 years at the 100k
    * cap), but the bound deserves the same explicit guard the other
    * bounded collects carry (AsOfStream.buildIndex). If a caller ever
    * points the fold at an unbounded key, the task fails with a
    * pointer to the windowed alternative instead of silently
    * assembling a multi-GB array per group.
    */
  private val MaxSeriesLen = 100000

  /** `arr` wrapped in the [[MaxSeriesLen]] guard — a CASE around the
    * fold input, so the check can't be pruned and costs one `size`
    * per group. Streaming-sized series belong in
    * [[graft.streaming.AnomalyStream]]-style keyed state instead.
    */
  private def boundedArr(gate: String) = expr(
    s"""CASE WHEN size(arr) <= $MaxSeriesLen THEN arr
       |ELSE raise_error(concat('$gate: per-series fold collected ',
       |  CAST(size(arr) AS STRING), ' elements (bound $MaxSeriesLen);
       |  use a windowed/streaming formulation for longer series'))
       |END""".stripMargin)

  /** DuckDB CTE chain of the per-series exact sign test, ending in
    * `sgn` = (event_type, n, k, p_num, p_den) — shared VERBATIM by
    * stats_sign_test and stats_fdr_bh (callers prepend WITH
    * RECURSIVE: `cc` builds the binomial coefficients by the
    * multiplicative recurrence).
    */
  /** DuckDB CTE prefix shared by the nonparametric trend tests
    * (stats_sign_test / stats_fdr_bh / stats_runs_test): the
    * two-regime series frame — stationary daily counts per event type
    * plus trending cumulative-distinct-user series — diffed
    * per-series into `dd` = (series, day, dx).
    */
  private val seriesDiffCtes: String =
    """cnts AS (
      |  SELECT event_type AS series,
      |    CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |fs AS (
      |  SELECT event_type, user_id,
      |    MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type || ':cum_users' AS series, day,
      |    CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type
      |      ORDER BY day) AS BIGINT) AS x
      |  FROM fs GROUP BY event_type, day),
      |daily AS (SELECT * FROM cnts UNION ALL SELECT * FROM cum),
      |dd AS (
      |  SELECT series, day,
      |    x - LAG(x) OVER (PARTITION BY series ORDER BY day) AS dx
      |  FROM daily)""".stripMargin

  private val signTestCtes: String =
    s"""$seriesDiffCtes,
      |nk AS (
      |  SELECT series,
      |    CAST(COUNT(*) FILTER (WHERE dx <> 0) AS BIGINT) AS n,
      |    CAST(COUNT(*) FILTER (WHERE dx > 0) AS BIGINT) AS k
      |  FROM dd WHERE dx IS NOT NULL GROUP BY 1),
      |jj AS (SELECT series, n, k,
      |  CASE WHEN n > 55 THEN CAST(error(concat('binomial recurrence: ',
      |      'n > 55 overflows BIGINT; use a normal approximation'))
      |    AS BIGINT) ELSE GREATEST(k, n - k) END AS j FROM nk),
      |cc AS (
      |  SELECT series, n, j, CAST(0 AS BIGINT) AS i,
      |    CAST(1 AS BIGINT) AS c
      |  FROM jj
      |  UNION ALL
      |  SELECT series, n, j, i + 1, c * (n - i) // (i + 1)
      |  FROM cc WHERE i < n),
      |tl AS (
      |  SELECT series, CAST(SUM(c) AS BIGINT) AS t
      |  FROM cc WHERE i >= j GROUP BY 1),
      |sgn AS (
      |  SELECT j.series, j.n, j.k,
      |    CAST(LEAST(2 * t.t, 1::BIGINT << CAST(j.n AS INT))
      |      AS BIGINT) AS p_num,
      |    CAST(1::BIGINT << CAST(j.n AS INT) AS BIGINT) AS p_den
      |  FROM jj j JOIN tl t ON t.series = j.series)""".stripMargin

  /** α = 5% two-sided Grubbs critical values, squared, in micro, for
    * n = 3..42 — floor(G²crit·10⁶) where G²crit = ((n−1)²/n) ·
    * t²/(ν+t²), t the upper-tail t-quantile at p = α/(2n), ν = n−2.
    * Computed offline from the exact t distribution (50-digit
    * incomplete-beta bisection); spot-checked against the published
    * two-sided table (n=10 → G=2.290, n=20 → 2.708, n=30 → 2.908).
    * Emitted as an identical CASE literal in BOTH engines, so the
    * small-n branch is exact-integer parity by construction. */
  private[graft] val grubbsSmallN: Seq[(Int, Long)] = Seq(
    3 -> 1332419L, 4 -> 2194101L, 5 -> 2941352L, 6 -> 3561316L,
    7 -> 4080272L, 8 -> 4522619L, 9 -> 4906243L, 10 -> 5243889L,
    11 -> 5544753L, 12 -> 5815619L, 13 -> 6061605L, 14 -> 6286657L,
    15 -> 6493872L, 16 -> 6685722L, 17 -> 6864209L, 18 -> 7030977L,
    19 -> 7187391L, 20 -> 7334594L, 21 -> 7473555L, 22 -> 7605099L,
    23 -> 7729939L, 24 -> 7848688L, 25 -> 7961885L, 26 -> 8069997L,
    27 -> 8173439L, 28 -> 8272578L, 29 -> 8367740L, 30 -> 8459215L,
    31 -> 8547264L, 32 -> 8632123L, 33 -> 8714002L, 34 -> 8793094L,
    35 -> 8869573L, 36 -> 8943599L, 37 -> 9015315L, 38 -> 9084856L,
    39 -> 9152342L, 40 -> 9217887L, 41 -> 9281593L, 42 -> 9343557L)

  /** Shared Spark/DuckDB column chain deriving `gcrit2_micro` (the
    * α = 5% two-sided Grubbs critical value, squared, micro) from a
    * BIGINT group size `n` ≥ 3. Small n (≤ 42) reads the exact
    * [[grubbsSmallN]] table; larger n evaluates ONE shared-text IEEE
    * chain whose only transcendental beyond sqrt is a single ln,
    * quantized through the proven micro-ln discipline
    * (DECIMAL(18,6)-rounded before any further arithmetic, so both
    * engines continue from the same exact integer):
    *  - zq   = sqrt(−2·ln p) for p = α/(2n) = 1/(40n) — n ≥ 43 keeps
    *           p < 0.02425, the single-branch region of the tail
    *           formula below;
    *  - zn   = Φ⁻¹(1−p) via Acklam's rational tail approximation
    *           (|rel err| < 1.2e−9, public constants);
    *  - tq   = the t-quantile at ν = n−2 via the Cornish–Fisher
    *           expansion (Abramowitz & Stegun 26.7.5, through ν⁻⁴ —
    *           ν ≥ 41 here, where the expansion is ~1e−7);
    *  - gf   = G²crit = ((n−1)²/n) · t²/(ν+t²).
    * Every step past the micro-ln is +,−,×,÷,sqrt over identical
    * text — IEEE-correctly-rounded and therefore bit-identical in
    * both engines. Validated offline against the exact t quantile at
    * 38 points spanning n = 43..10⁸ (including every driver-SF group
    * size): max relative error on G²crit is 2.9e−7, i.e. ≤ ~3 micro
    * units at the threshold — far inside the statistical meaning of
    * "α = 5%". Column order matters: each entry may reference the
    * names before it (Spark folds withColumn; DuckDB layers CTEs). */
  private[graft] val grubbsCritCols: Seq[(String, String)] = Seq(
    "l40n" -> ("CAST(CAST(ln(CAST(40 * n AS DOUBLE)) AS DECIMAL(18,6))" +
      " * 1000000 AS BIGINT)"),
    "zq" -> "sqrt(CAST(2 * l40n AS DOUBLE) / 1000000.0)",
    "zn" -> ("0.0 - (((((((-0.007784894002430293) * zq + " +
      "(-0.3223964580411365)) * zq + (-2.400758277161838)) * zq + " +
      "(-2.549732539343734)) * zq + 4.374664141464968) * zq + " +
      "2.938163982698783) / ((((0.007784695709041462 * zq + " +
      "0.3224671290700398) * zq + 2.445134137142996) * zq + " +
      "3.754408661907416) * zq + 1.0))"),
    "zz" -> "zn * zn",
    "nud" -> "CAST(n - 2 AS DOUBLE)",
    "tq" -> ("zn + (zn * zz + zn) / (4.0 * nud) + ((5.0 * zz * zz + " +
      "16.0 * zz + 3.0) * zn) / (96.0 * nud * nud) + ((3.0 * zz * zz " +
      "* zz + 19.0 * zz * zz + 17.0 * zz + (-15.0)) * zn) / (384.0 * " +
      "nud * nud * nud) + ((79.0 * zz * zz * zz * zz + 776.0 * zz * " +
      "zz * zz + 1482.0 * zz * zz + (-1920.0) * zz + (-945.0)) * zn) " +
      "/ (92160.0 * nud * nud * nud * nud)"),
    "gf" -> ("(CAST(n - 1 AS DOUBLE) * CAST(n - 1 AS DOUBLE) / " +
      "CAST(n AS DOUBLE)) * (tq * tq) / (nud + tq * tq)"),
    "gcrit2_micro" -> ("CASE " + grubbsSmallN.map { case (n, m) =>
      s"WHEN n = $n THEN CAST($m AS BIGINT)" }.mkString(" ") +
      " ELSE CAST(floor(gf * 1000000.0) AS BIGINT) END"))

  /** Spark side of [[signTestCtes]]: per event_type, the day-over-day
    * sign counts and the exact two-sided binomial p as a p_num/p_den
    * rational. The binomial tail is a per-series `aggregate` fold
    * (calendar-bounded, like [[ewmaFold]]); n > 55 fails loudly AND
    * symmetrically in both engines — Spark raise_error here, an
    * explicit error() guard in [[signTestCtes]]'s jj CTE (DuckDB's
    * own multiplicative recurrence would stay exact up to n ≈ 61,
    * so without the guard there would be a one-sided 56..61 window
    * where the oracle succeeds while Spark errors).
    */
  /** Spark side of [[seriesDiffCtes]]: the two-regime series frame,
    * diffed per series — (series, day, dx) with the first day's null
    * diff retained (callers filter).
    */
  /** The two-regime per-series daily frame (series, day, x) the
    * nonparametric trend tests read — stationary daily counts per
    * event type (the tests must NOT fire) plus trending cumulative
    * distinct users per type (they MUST). Spark side of
    * [[seriesDiffCtes]]' `daily` CTE.
    */
  private def seriesDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val cnts = ev
      .groupBy(col("event_type").as("series"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("x"))
    // Cumsum window is partitioned by event_type; only days a new
    // user appeared carry rows, which tie-dropping makes equivalent
    // to the full calendar frame.
    val wc = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val cum = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("nu"))
      .select(concat(col("event_type"), lit(":cum_users")).as("series"),
        col("day"), sum(col("nu")).over(wc).cast("long").as("x"))
    cnts.unionByName(cum)
  }

  private def seriesDiffs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("day"))
    seriesDaily(s, dir)
      .select(col("series"), col("day"),
        (col("x") - lag(col("x"), 1).over(w)).as("dx"))
  }

  /** Array [C(a,0)..C(a,a)] via the multiplicative recurrence as a
    * Catalyst fold — shared by the runs test; `a` is an integer SQL
    * expression. a > 55 fails loudly (the last exactly-representable
    * step is C(55,27)·29 < 2^63); callers gate evaluation behind a
    * lazy CASE so degenerate rows never run the recurrence.
    */
  private def binomArr(a: String) = expr(
    s"""CASE
       |  WHEN ($a) > 55 THEN raise_error(concat(
       |    'binomial recurrence: a = ', CAST(($a) AS STRING),
       |    ' > 55 overflows BIGINT; use a normal approximation'))
       |  WHEN ($a) <= 0 THEN array(CAST(1 AS BIGINT))
       |  ELSE aggregate(sequence(1, CAST(($a) AS INT)),
       |    array(CAST(1 AS BIGINT)),
       |    (acc, i) -> array_append(acc,
       |      element_at(acc, -1) * (($a) - i + 1) div i))
       |END""".stripMargin)

  private def signTest(s: SparkSession, dir: String): DataFrame = {
    seriesDiffs(s, dir)
      .filter(col("dx").isNotNull)
      .groupBy(col("series"))
      .agg(sum(when(col("dx") =!= 0, 1L).otherwise(0L)).as("n"),
        sum(when(col("dx") > 0, 1L).otherwise(0L)).as("k"))
      .withColumn("j", greatest(col("k"), col("n") - col("k")))
      .withColumn("t", expr(
        """CASE
          |  WHEN n > 55 THEN raise_error(concat('stats_sign_test: n = ',
          |    CAST(n AS STRING), ' > 55 overflows the exact binomial
          |    recurrence; use a normal-approximation variant'))
          |  WHEN n = 0 THEN CAST(1 AS BIGINT)
          |  ELSE aggregate(sequence(1, CAST(n AS INT)),
          |    named_struct('c', CAST(1 AS BIGINT),
          |      'tl', CAST(CASE WHEN j = 0 THEN 1 ELSE 0 END AS BIGINT)),
          |    (acc, i) -> named_struct(
          |      'c', acc.c * (n - i + 1) div i,
          |      'tl', acc.tl + CASE WHEN i >= j
          |        THEN acc.c * (n - i + 1) div i
          |        ELSE CAST(0 AS BIGINT) END),
          |    acc -> acc.tl)
          |END""".stripMargin))
      .select(col("series"), col("n"), col("k"),
        expr("CAST(least(2 * t, shiftleft(CAST(1 AS BIGINT)," +
          " CAST(n AS INT))) AS BIGINT)").as("p_num"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(n AS INT))").as("p_den"))
  }

  /** Exact-integer EWMA (α = 1/2, floor) over a daily-count frame
    * (event_type, day, n_events) — shared by the ts_ewma gate and the
    * streaming pipeline (AnomalyStream daily counts → this fold, the
    * same split as [[anomalyFlags]]). Recursion is per-series over the
    * calendar-bounded daily frame, so the per-group fold is constant
    * work per day regardless of event volume.
    */
  private[graft] def ewmaFold(daily: DataFrame): DataFrame =
    daily
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("n_events"))))
        .as("arr"))
      .withColumn("arr", boundedArr("ts_ewma"))
      .select(col("event_type"), explode(expr(
        """aggregate(arr,
          |  CAST(array() AS ARRAY<STRUCT<day: DATE, n_events: BIGINT,
          |    ewma: BIGINT>>),
          |  (acc, x) -> array_append(acc, named_struct(
          |    'day', x.day, 'n_events', x.n_events,
          |    'ewma', CASE WHEN size(acc) = 0 THEN x.n_events
          |      ELSE (element_at(acc, -1).ewma + x.n_events) div 2
          |      END)))""".stripMargin)).as("e"))
      .select(col("event_type"), col("e.day").as("day"),
        col("e.n_events").as("n_events"), col("e.ewma").as("ewma"))

  /** Gap-sessionized user sessions (4 h idle cut): one row per
    * (user_id, sess) with [start_us, end_us] bounds — shared by the
    * sessionize gate and the interval-overlap join. Both windows and
    * the aggregate share the single user_id shuffle partitioning.
    */
  private[operators] def sessions(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 14400000000L // 4 hours
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("sess", sum(col("new_s")).over(wc).cast("long"))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("long").as("n_purchase"))
  }

  /** DuckDB CTE chain producing the same session table (expects to be
    * embedded in a WITH list; final CTE is named `sess`). */
  private[operators] val sessionsSql =
    """e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |f AS (SELECT *, CASE WHEN
      |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
      |    OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |       > 14400000000 THEN 1 ELSE 0 END AS new_s FROM e),
      |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) AS BIGINT) AS sess FROM f),
      |sess AS (SELECT user_id, sess, count(*) AS n_events,
      |  min(us) AS start_us, max(us) AS end_us,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchase
      |FROM g GROUP BY 1, 2)""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    // A1: per-(series, hour) OHLC+volume+vwap candles.
    QuerySpec.sql(
      "a1_hourly_candles",
      s"""SELECT * FROM ($hourlyCandlesSql)
         |ORDER BY event_type, hour""".stripMargin) { (s, dir) =>
      hourlyCandles(s, dir).orderBy(col("event_type"), col("hour"))
    },

    // A2: candle rollup cascade — daily candles re-reduced from hourly
    // children using the hour key as sort_open/sort_close
    // (exchanges.js:282-359): associative merge, no rescan of raw rows.
    QuerySpec.sql(
      "a2_daily_candle_rollup",
      s"""SELECT event_type, day,
         |  min_by(open, hour) AS open, max_by(close, hour) AS close,
         |  max(high) AS high, min(low) AS low,
         |  ${dsumSql("volume")} AS volume,
         |  CAST(SUM(n) AS BIGINT) AS n
         |FROM ($hourlyCandlesSql)
         |GROUP BY event_type, day
         |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      hourlyCandles(s, dir)
        .groupBy(col("event_type"), col("day"))
        .agg(
          min_by(col("open"), col("hour")).as("open"),
          max_by(col("close"), col("hour")).as("close"),
          max(col("high")).as("high"),
          min(col("low")).as("low"),
          dsum(col("volume")).as("volume"),
          sum(col("n")).cast("long").as("n"))
        .orderBy(col("event_type"), col("day"))
    },

    // A4: per-(series, day) count/amount/average (payment volume;
    // payments.js:361-384).
    QuerySpec.sql(
      "a4_daily_volume",
      s"""SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |  COUNT(*) AS n, ${dsumSql("value")} AS amount,
         |  ${davgSql("value")} AS avg_amount
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("amount"),
          davg(col("value")).as("avg_amount"))
        .orderBy(col("event_type"), col("day"))
    },

    // A5: per-(account, day) activity profile with distinct counterparty
    // count (accountPayments.js:223-285; collect_set → countDistinct).
    QuerySpec.sql(
      "a5_user_day_profile",
      s"""SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         |  COUNT(*) AS n_events,
         |  COUNT(DISTINCT event_type) AS n_types,
         |  ${dsumSql("value")} AS total,
         |  MAX(value) AS max_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY user_id, day""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          dsum(col("value")).as("total"),
          max(col("value")).as("max_value"))
        .orderBy(col("user_id"), col("day"))
    },

    // A6: network-stats counters — per-day counts by type (dynamic
    // `type:` column family → conditional aggregation; stats.js:235-288)
    // plus running averages (stats.js:313-337).
    QuerySpec.sql(
      "a6_daily_stats",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id) AS events_per_user
        |FROM events
        |GROUP BY 1
        |ORDER BY day""".stripMargin) { (s, dir) =>
      def cnt(tpe: String) =
        sum(when(col("event_type") === tpe, 1).otherwise(0)).cast("long").as(s"n_$tpe")
      events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_total"),
          cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"),
          countDistinct(col("user_id")).as("n_users"),
          (count(lit(1)).cast("double") / countDistinct(col("user_id")))
            .as("events_per_user"))
        .orderBy(col("day"))
    },

    // A8: first-seen-per-key counts (accounts created per day;
    // lib/ledgerParser/accountsCreated.js + data.js:2403-2495).
    QuerySpec.sql(
      "a8_new_users_daily",
      """SELECT CAST(date_trunc('day', first_ts) AS DATE) AS day,
        |  COUNT(*) AS n_new
        |FROM (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
        |GROUP BY 1
        |ORDER BY day""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"))
        .groupBy(to_date(col("first_ts")).as("day"))
        .agg(count(lit(1)).as("n_new"))
        .orderBy(col("day"))
    },

    // A11/W2: cumulative daily volume per series (issuer capitalization
    // running total; data.js:980-988).
    QuerySpec.sql(
      "a11_cumulative_daily_volume",
      s"""SELECT event_type, day, vol,
         |  CAST(SUM(CAST(vol AS DECIMAL(38,6))) OVER (
         |    PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS cum_vol
         |FROM (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |    ${dsumSql("value")} AS vol
         |  FROM events GROUP BY 1, 2)
         |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(dsum(col("value")).as("vol"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("event_type"), col("day"), col("vol"),
          dsumOver(col("vol"), w).as("cum_vol"))
        .orderBy(col("event_type"), col("day"))
    },

    // W4: inter-event interval per key via lag (ledger_interval running
    // average; stats.js:327-331).
    QuerySpec.sql(
      "w4_avg_event_gap",
      """SELECT user_id, COUNT(gap) AS n_gaps,
        |  CAST(SUM(gap) AS BIGINT) AS total_gap_s,
        |  CAST(SUM(gap) AS DOUBLE) / COUNT(gap) AS avg_gap_s
        |FROM (
        |  SELECT user_id,
        |    sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS gap
        |  FROM (SELECT user_id, ts, event_id,
        |          CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events))
        |GROUP BY user_id
        |HAVING COUNT(gap) > 0
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(col("gap")).as("n_gaps"),
          sum(col("gap")).cast("long").as("total_gap_s"),
          (sum(col("gap")).cast("double") / count(col("gap"))).as("avg_gap_s"))
        .filter(col("n_gaps") > 0)
        .orderBy(col("user_id"))
    },

    // Bot/automation screen — the training-data cleaning rule that
    // drops machine traffic before it pollutes a corpus: a scripted
    // client fires on a timer, so its inter-event gaps have an
    // abnormally LOW coefficient of variation, while organic behavior
    // is bursty (cv ≳ 1). Per user with ≥ 5 gaps: mean gap and cv² in
    // exact ppm via the integer moment identity (n·Σg² − (Σg)²)·10⁶ /
    // (Σg)² — wide products ride HUGEINT ≡ DECIMAL(38,0), floats never
    // appear, so the bot verdict (cv² < 0.05, n ≥ 20) is decided on
    // the same integer in both engines. One keyed lag window + one
    // aggregate, both partitioned by user.
    QuerySpec.sql(
      "events_bot_regularity",
      """WITH g AS (
        |  SELECT user_id,
        |    sec - LAG(sec) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS gap
        |  FROM (SELECT user_id, ts, event_id,
        |          CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events)),
        |a AS (
        |  SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
        |    CAST(SUM(gap) AS BIGINT) AS sg,
        |    CAST(SUM(gap * gap) AS BIGINT) AS sgg
        |  FROM g GROUP BY user_id
        |  HAVING COUNT(gap) >= 5)
        |SELECT user_id, n_gaps, sg // n_gaps AS mean_gap_s,
        |  CASE WHEN sg > 0 THEN
        |    CAST((CAST(n_gaps AS HUGEINT) * sgg - CAST(sg AS HUGEINT) * sg)
        |      * 1000000 // (CAST(sg AS HUGEINT) * sg) AS BIGINT) END
        |    AS cv2_ppm,
        |  sg > 0 AND n_gaps >= 20
        |    AND (CAST(n_gaps AS HUGEINT) * sgg - CAST(sg AS HUGEINT) * sg)
        |      * 1000000 // (CAST(sg AS HUGEINT) * sg) < 50000 AS is_bot
        |FROM a
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(col("gap")).as("n_gaps"),
          sum(col("gap")).cast("long").as("sg"),
          sum(col("gap") * col("gap")).cast("long").as("sgg"))
        .filter(col("n_gaps") >= 5)
        .select(col("user_id"), col("n_gaps"),
          expr("sg div n_gaps").as("mean_gap_s"),
          expr("CASE WHEN sg > 0 THEN CAST(" +
            "(CAST(n_gaps AS DECIMAL(38,0)) * sgg" +
            " - CAST(sg AS DECIMAL(38,0)) * sg) * 1000000" +
            " div (CAST(sg AS DECIMAL(38,0)) * sg) AS BIGINT) END")
            .as("cv2_ppm"),
          expr("sg > 0 AND n_gaps >= 20 AND" +
            " (CAST(n_gaps AS DECIMAL(38,0)) * sgg" +
            " - CAST(sg AS DECIMAL(38,0)) * sg) * 1000000" +
            " div (CAST(sg AS DECIMAL(38,0)) * sg) < 50000")
            .as("is_bot"))
        .orderBy(col("user_id"))
    },

    // S: latest event per key (descending scan limit 1 per account;
    // data.js:1120-1139). Timestamp exported as epoch micros for exact
    // cross-engine comparison. Top-1 per key as a max_by FOLD (map-side
    // combine, no per-user sort) — the oracle keeps the row_number
    // spelling, identical relation under the total (ts, event_id)
    // order.
    QuerySpec.sql(
      "s_latest_event_per_user",
      """SELECT user_id, event_id, last_us, last_type, last_value
        |FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS last_us,
        |    event_type AS last_type, value AS last_value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("event_id"), unix_micros(col("ts")).as("last_us"),
            col("event_type").as("last_type"),
            col("value").as("last_value")),
          struct(col("ts"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("event_id"),
          col("m.last_us").as("last_us"), col("m.last_type").as("last_type"),
          col("m.last_value").as("last_value"))
        .orderBy(col("user_id"))
    },

    // J4: time-bucket equi-join of two aggregate series (metric ↔ FX-rate
    // bucket join; data.js:800-856).
    QuerySpec.sql(
      "j4_bucket_join",
      s"""SELECT p.day AS day, p.purchase_vol, c.clicks
         |FROM (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |    ${dsumSql("value")} AS purchase_vol
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1) p
         |JOIN (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |    COUNT(*) AS clicks
         |  FROM events WHERE event_type = 'click' GROUP BY 1) c
         |ON p.day = c.day
         |ORDER BY day""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(dsum(col("value")).as("purchase_vol"))
      val c = ev.filter(col("event_type") === "click")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("clicks"))
      p.join(c, Seq("day")).orderBy(col("day"))
    },

    // Backward as-of join: every event picks up the user's latest
    // order at-or-before its timestamp — the point-in-time temporal
    // join (rates→trades, features→labels) Spark lacks natively,
    // implemented as the merge-and-forward-fill plan in
    // [[graft.functions.AsOfJoin]] (one key shuffle + ordered window;
    // no per-row range probe). The build side is pre-deduped to one
    // row per (cust, date) so "latest" is well-defined and both
    // engines agree; the oracle is DuckDB's native ASOF LEFT JOIN —
    // different algorithm, identical relation.
    QuerySpec.sql(
      "j_asof_latest_order",
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate,
        |    CAST(MAX(o_orderkey) AS BIGINT) AS o_orderkey,
        |    max_by(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  o.o_orderkey, o.o_totalprice
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ords = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      graft.functions.AsOfJoin.asofBackward(
          events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
          "user_id", "ts",
          ords, "o_custkey", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // Range (interval) join: clicks landing in the day after each
    // purchase, per user — the point-in-interval temporal join.
    // [[graft.functions.RangeJoin]] buckets time so the range predicate
    // rides a plain hash equi-join on (user, bucket) — no nested-loop
    // range probe; each interval is replicated to ≤ 2 one-day buckets.
    // The oracle keeps the declarative BETWEEN formulation.
    QuerySpec.sql(
      "j_range_clicks_after_purchase",
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, CAST(COUNT(c.ts) AS BIGINT) AS n_clicks_1d
        |FROM p LEFT JOIN c
        |  ON c.user_id = p.user_id
        |  AND p.ts <= c.ts AND c.ts < p.ts + INTERVAL 1 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val dayUs = 86400000000L
      val ev = events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t0"))
        .withColumn("t1", col("t0") + dayUs)
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("ct"))
      val pairs = graft.functions.RangeJoin.pointInInterval(
        p, "user_id", "t0", "t1", c, "user_id", "ct", dayUs)
      val counts = pairs
        .groupBy(col("i_event_id").as("event_id"))
        .agg(count(lit(1)).as("n_clicks_1d"))
      p.select(col("event_id"))
        .join(counts, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_clicks_1d"), lit(0L)).as("n_clicks_1d"))
        .orderBy(col("event_id"))
    },

    // Gap-based sessionization — the standard event-stream operator
    // (split a user's clickstream into sessions at >4 h idle gaps):
    // lag over (user, ts) marks session starts, a running sum of the
    // marks numbers the sessions, then one hash aggregate per
    // (user, session). Both windows share the single user_id shuffle
    // partitioning, so the whole operator costs ONE exchange; session
    // keys are uniform (per-user event counts), no skew. Timestamps
    // compared in epoch micros — exact vs DuckDB's nanos because the
    // events fixture is µs-aligned.
    QuerySpec.sql(
      "sessionize_events",
      s"""WITH $sessionsSql
        |SELECT user_id, sess, n_events, start_us, end_us, n_purchase
        |FROM sess ORDER BY user_id, sess""".stripMargin) { (s, dir) =>
      sessions(s, dir).orderBy(col("user_id"), col("sess"))
    },

    // Sessionization via Spark's NATIVE session_window — the built-in
    // the custom island-trick plan should be measured against (same
    // data, one groupBy, no lag/cumsum windows; Spark merges sessions
    // in a dedicated aggregate). Semantics differ from the custom
    // gate at one boundary: session_window is half-open [start,
    // last+gap), so an event landing EXACTLY gap after its
    // predecessor starts a NEW session (the custom plan's `> gap`
    // keeps it) — the oracle spells `>= gap` to match. window.end =
    // last event + gap rides along as end_pad_us to pin that contract.
    QuerySpec.sql(
      "sessionize_native",
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us
        |  FROM events),
        |f AS (SELECT *, CASE WHEN
        |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      IS NULL
        |    OR us - lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) >= 14400000000
        |    THEN 1 ELSE 0 END AS new_s FROM e),
        |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS BIGINT) AS sess FROM f)
        |SELECT user_id, CAST(MIN(us) AS BIGINT) AS start_us,
        |  CAST(MAX(us) + 14400000000 AS BIGINT) AS end_pad_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase
        |FROM g GROUP BY user_id, sess
        |ORDER BY user_id, start_us""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "4 hours").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchase"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_pad_us"),
          col("n_events"), col("n_purchase"))
        .orderBy(col("user_id"), col("start_us"))
    },

    // Weekly cohort retention over purchase events: cohort = a user's
    // first purchase day; each later purchase lands in a week-offset
    // bucket relative to that cohort day. Two hash aggregates plus one
    // shuffle join on the uniform user_id key (the per-user firsts
    // table is a dimension — AQE broadcasts it when it fits); the
    // distinct collapses map-side before the final count.
    QuerySpec.sql(
      "cohort_retention",
      """WITH p AS (SELECT user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM p GROUP BY 1),
        |a AS (SELECT DISTINCT p.user_id, f.cohort_day,
        |    CAST((CAST(p.ts AS DATE) - f.cohort_day) // 7 AS BIGINT)
        |      AS week_offset
        |  FROM p JOIN f USING (user_id))
        |SELECT cohort_day, week_offset, count(*) AS n_users
        |FROM a GROUP BY 1, 2
        |ORDER BY cohort_day, week_offset""".stripMargin) { (s, dir) =>
      val p = events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val f = p.groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      p.join(f, Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          expr("datediff(CAST(ts AS DATE), cohort_day) div 7")
            .cast("long").as("week_offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_day"), col("week_offset"))
    },

    // Conversion funnel: of the users who signed up, how many purchased
    // within 7 days of their first signup, by signup day. The probe is
    // an equi-join on user_id with the time window as a post-predicate
    // — a plain hash join (no nested-loop range probe needed because
    // conversion only needs EXISTS, not the matching rows).
    QuerySpec.sql(
      "funnel_signup_purchase",
      """WITH s AS (SELECT user_id, min(ts) AS s_ts, min(epoch_us(ts)) AS s_us
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT s.user_id, CAST(s.s_ts AS DATE) AS signup_day,
        |    CAST(max(CASE WHEN p.us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS converted
        |  FROM s LEFT JOIN (SELECT user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'purchase') p
        |    ON p.user_id = s.user_id AND p.us > s.s_us
        |    AND p.us <= s.s_us + 604800000000
        |  GROUP BY 1, 2)
        |SELECT signup_day, CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(sum(converted) AS BIGINT) AS n_converted
        |FROM c GROUP BY 1 ORDER BY signup_day""".stripMargin) { (s, dir) =>
      val weekUs = 604800000000L
      val ev = events(s, dir)
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("s_ts"),
          min(unix_micros(col("ts"))).as("s_us"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("us"))
      s0.join(pur,
          col("p_user") === col("user_id") && col("us") > col("s_us") &&
            col("us") <= col("s_us") + weekUs, "left")
        .groupBy(col("user_id"), to_date(col("s_ts")).as("signup_day"))
        .agg(max(when(col("us").isNotNull, 1).otherwise(0))
          .cast("long").as("converted"))
        .groupBy(col("signup_day"))
        .agg(count(lit(1)).cast("long").as("n_signups"),
          sum(col("converted")).cast("long").as("n_converted"))
        .orderBy(col("signup_day"))
    },

    // KMV (k-minimum-values) distinct-count sketch, k = 64: estimate
    // distinct users per event type from the 64 smallest md5 hash
    // values — the mergeable bottom-k sketch (Bar-Yossef et al.);
    // unlike HLL it is DETERMINISTIC given the hash, so both engines
    // produce the identical estimate and the gate hash-compares. The
    // bottom-k selection is the same two-level (salt-bucketed local
    // rank → tiny global rank) shape as temperature sampling, so no
    // per-type sort of the full distinct-hash set. 13 hex chars = 52
    // bits keeps every value and the estimator arithmetic exact in
    // doubles.
    QuerySpec.sql(
      "sketch_kmv_distinct",
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM events),
        |r AS (SELECT event_type, hv,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS nd
        |      FROM h)
        |SELECT event_type, CAST(nd AS BIGINT) AS n_hashes,
        |  CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
        |       ELSE (CAST(63 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE))
        |            / CAST(hv AS DOUBLE) END AS kmv_est
        |FROM r WHERE rn = LEAST(nd, 64)
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val k = 64
      val h = events(s, dir)
        .select(col("event_type"),
          graft.functions.Md5Prefix.md5_prefix_long(
            col("user_id").cast("string"), 13).as("hv"))
        .distinct()
      val wLocal = Window
        .partitionBy(col("event_type"), pmod(xxhash64(col("hv")), lit(16)))
        .orderBy(col("hv"))
      val wGlobal = Window.partitionBy(col("event_type")).orderBy(col("hv"))
      val nd = h.groupBy(col("event_type")).agg(count(lit(1)).as("nd"))
      h.withColumn("lrk", row_number().over(wLocal))
        .filter(col("lrk") <= k) // ≤ 16·k survivors per type
        .withColumn("rn", row_number().over(wGlobal))
        .join(broadcast(nd), Seq("event_type"))
        .filter(col("rn") === least(col("nd"), lit(k)))
        .select(col("event_type"), col("nd").as("n_hashes"),
          when(col("nd") < k, col("nd").cast("double"))
            .otherwise(lit(63.0) * lit(4503599627370496.0) /
              col("hv").cast("double"))
            .as("kmv_est"))
        .orderBy(col("event_type"))
    },

    // KMV sketch SET ALGEBRA (the theta-sketch operations): union,
    // intersection, and Jaccard estimated for every event-type pair
    // FROM THE 64-VALUE SKETCHES ALONE — the property that makes
    // bottom-k the warehouse overlap sketch: audience-overlap /
    // cross-corpus-contamination queries over N sources need only the
    // N·k sketch values, never a re-scan of the raw sets. bottom-k of
    // (S_A ∪ S_B) is itself a valid sketch of A∪B, and the fraction ρ
    // of its values present in BOTH input sketches estimates Jaccard
    // (Beyer et al. 2007); intersection ≈ ρ · union_est. Everything
    // is deterministic given the md5 hash (integer ranks + one double
    // division + one double multiply on identical operands), so the
    // ESTIMATES hash-compare; the exact Jaccard rides along and
    // within_bound self-measures |est − exact| ≤ 0.35 (vs the ~1/√k
    // = 0.125 standard error). The sketched element is the
    // (user, active-day) pair — every user touches every event type
    // in the synthetic data, so plain user sets would make all ten
    // Jaccards exactly 1; user-days overlap partially and exercise
    // the estimator. Scale shape: per-type sketches via the
    // salt-bucketed two-level bottom-k (no per-type sort of the full
    // hash set); all pair work happens on ≤ 2k rows per pair.
    // Sliding-window distinct users from MERGED HLL sketches — the
    // mergeability demonstration that is the entire reason sketches
    // win at 100 TB: registers are built ONCE per (series, day) (the
    // pre-aggregated sketch table a warehouse persists), and any
    // window is answered by max-merging register rows — the raw
    // events are never rescanned. Each day's registers serve the 7
    // windows they belong to via an explode (equi-join, shuffle-
    // friendly — no inequality join, no nested loop). The exact
    // 7-day distinct rides along and within_bound self-measures the
    // estimate, like sketch_hll_distinct.
    QuerySpec.sql(
      "sketch_hll_window",
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d, user_id,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, d, hv % 64 AS bucket,
        |    MAX(CASE WHEN hv >> 6 = 0 THEN 47
        |      ELSE 47 - length(bin(hv >> 6)) END) AS mj
        |  FROM h GROUP BY 1, 2, 3),
        |days AS (SELECT DISTINCT event_type, d FROM h),
        |srv AS (
        |  SELECT r.event_type, r.d + o AS wd, r.bucket, r.mj
        |  FROM r, LATERAL (SELECT unnest(generate_series(0, 6)) AS o) g),
        |wreg AS (
        |  SELECT s.event_type, s.wd, s.bucket, MAX(s.mj) AS mj
        |  FROM srv s JOIN days dy
        |    ON dy.event_type = s.event_type AND dy.d = s.wd
        |  GROUP BY 1, 2, 3),
        |agg AS (
        |  SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS used,
        |    CAST(SUM(CAST(POW(2, 47 - mj) AS BIGINT)) AS BIGINT)
        |      AS s_used
        |  FROM wreg GROUP BY 1, 2),
        |fin AS (
        |  SELECT event_type, wd, used,
        |    CASE WHEN CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |          * CAST(140737488355328 AS DOUBLE)
        |          / CAST(s_used + (64 - used) * 140737488355328
        |            AS DOUBLE)
        |        <= CAST(160 AS DOUBLE) AND used < 64
        |      THEN CAST(64 AS DOUBLE)
        |        * ln(CAST(64 AS DOUBLE) / CAST(64 - used AS DOUBLE))
        |      ELSE CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |          * CAST(140737488355328 AS DOUBLE)
        |          / CAST(s_used + (64 - used) * 140737488355328
        |            AS DOUBLE)
        |      END AS est
        |  FROM agg),
        |exd AS (
        |  SELECT x.event_type, x.wd,
        |    CAST(COUNT(DISTINCT x.user_id) AS BIGINT) AS n_exact
        |  FROM (SELECT h.event_type, h.d + o AS wd, h.user_id
        |    FROM h, LATERAL (SELECT unnest(generate_series(0, 6)) AS o)
        |      g2) x
        |  JOIN days dy ON dy.event_type = x.event_type AND dy.d = x.wd
        |  GROUP BY 1, 2)
        |SELECT f.event_type, f.wd AS window_day, f.used AS n_regs_used,
        |  CAST(CAST(f.est AS DECIMAL(18,6)) AS DOUBLE) AS hll_est,
        |  e.n_exact,
        |  abs(CAST(CAST(f.est AS DECIMAL(18,6)) AS DOUBLE)
        |      - CAST(e.n_exact AS DOUBLE)) * CAST(4 AS DOUBLE)
        |    <= CAST(e.n_exact AS DOUBLE) AS within_bound
        |FROM fin f JOIN exd e
        |  ON e.event_type = f.event_type AND e.wd = f.wd
        |ORDER BY f.event_type, window_day""".stripMargin) { (s, dir) =>
      val h = events(s, dir).select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"),
        graft.functions.Md5Prefix.md5_prefix_long(
          col("user_id").cast("string"), 13).as("hv"))
      val r = h
        .select(col("event_type"), col("d"),
          pmod(col("hv"), lit(64L)).as("bucket"),
          when(shiftright(col("hv"), 6) === 0, lit(47))
            .otherwise(lit(47) - length(bin(shiftright(col("hv"), 6))))
            .as("rho"))
        .groupBy(col("event_type"), col("d"), col("bucket"))
        .agg(max(col("rho")).as("mj"))
      val days = h.select(col("event_type"), col("d")).distinct()
      val wreg = r
        .select(col("event_type"), col("bucket"), col("mj"),
          explode(expr("sequence(d, d + 6)")).as("wd"))
        .join(days.withColumnRenamed("d", "wd"), Seq("event_type", "wd"))
        .groupBy(col("event_type"), col("wd"), col("bucket"))
        .agg(max(col("mj")).as("mj"))
      val agg = wreg.groupBy(col("event_type"), col("wd"))
        .agg(count(lit(1)).as("used"),
          sum(expr("CAST(POW(2, 47 - mj) AS BIGINT)")).as("s_used"))
      val raw = lit(0.709) * lit(4096.0) * lit(140737488355328.0) /
        (col("s_used") +
          (lit(64L) - col("used")) * lit(140737488355328L))
          .cast("double")
      val fin = agg.select(col("event_type"), col("wd"), col("used"),
        when(raw <= lit(160.0) && col("used") < 64,
          lit(64.0) *
            log(lit(64.0) / (lit(64L) - col("used")).cast("double")))
          .otherwise(raw)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .cast("double").as("hll_est"))
      val exd = h
        .select(col("event_type"), col("user_id"),
          explode(expr("sequence(d, d + 6)")).as("wd"))
        .join(days.withColumnRenamed("d", "wd"), Seq("event_type", "wd"))
        .groupBy(col("event_type"), col("wd"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      fin.join(exd, Seq("event_type", "wd"))
        .select(col("event_type"), col("wd").as("window_day"),
          col("used").as("n_regs_used"), col("hll_est"), col("n_exact"),
          (abs(col("hll_est") - col("n_exact").cast("double")) * 4.0 <=
            col("n_exact").cast("double")).as("within_bound"))
        .orderBy(col("event_type"), col("window_day"))
    },

    // Capture–recapture (Lincoln–Petersen/Chapman) population
    // estimate — the ecology estimator a data platform uses when two
    // INDEPENDENT partial observations of a population exist (two
    // crawls, two telemetry taps) and neither is complete: N̂ =
    // (n_A+1)(n_B+1)/(m+1) − 1 from the two sample sizes and their
    // overlap. The samples are independent engine-portable md5 draws
    // (distinct salts, 25% each = threshold 2⁵⁰ of the 52-bit
    // prefix), the estimate is one exact integer expression, and
    // err_ppm self-measures it against the true distinct count. One
    // distinct pass + one fold.
    QuerySpec.sql(
      "sketch_capture_recapture",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |f AS (
        |  SELECT
        |    CASE WHEN CAST(('0x' || substr(md5(
        |      CAST(user_id AS VARCHAR) || ':crA'), 1, 13)) AS BIGINT)
        |      < 1125899906842624 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN CAST(('0x' || substr(md5(
        |      CAST(user_id AS VARCHAR) || ':crB'), 1, 13)) AS BIGINT)
        |      < 1125899906842624 THEN 1 ELSE 0 END AS b
        |  FROM u),
        |g AS (
        |  SELECT CAST(SUM(a) AS BIGINT) AS n_a,
        |    CAST(SUM(b) AS BIGINT) AS n_b,
        |    CAST(SUM(a * b) AS BIGINT) AS n_both,
        |    CAST(COUNT(*) AS BIGINT) AS n_true
        |  FROM f)
        |SELECT n_a, n_b, n_both, n_true,
        |  CAST((n_a + 1) * (n_b + 1) // (n_both + 1) - 1 AS BIGINT)
        |    AS chapman_est,
        |  CAST(ABS((n_a + 1) * (n_b + 1) // (n_both + 1) - 1 - n_true)
        |    * 1000000 // n_true AS BIGINT) AS err_ppm
        |FROM g""".stripMargin) { (s, dir) =>
      import graft.functions.Md5Prefix
      val thresh = 1125899906842624L
      events(s, dir).select(col("user_id")).distinct()
        .select(
          (Md5Prefix.md5_prefix_long(
            concat(col("user_id").cast("string"), lit(":crA")), 13)
            < thresh).cast("long").as("a"),
          (Md5Prefix.md5_prefix_long(
            concat(col("user_id").cast("string"), lit(":crB")), 13)
            < thresh).cast("long").as("b"))
        .agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
          sum(col("a") * col("b")).as("n_both"),
          count(lit(1)).as("n_true"))
        .select(col("n_a"), col("n_b"), col("n_both"), col("n_true"),
          expr("CAST((n_a + 1) * (n_b + 1) div (n_both + 1) - 1 " +
            "AS BIGINT)").as("chapman_est"),
          expr("CAST(ABS((n_a + 1) * (n_b + 1) div (n_both + 1) - 1 " +
            "- n_true) * 1000000 div n_true AS BIGINT)").as("err_ppm"))
    },

    // Join-size estimation from a correlated key sample — the
    // optimizer statistic that decides shuffle vs broadcast vs skew
    // handling before a single task runs. True self-join size on
    // user_id is Σ c(u)² (quadratic in the per-key counts, so naive
    // row sampling misses the skew that matters); hash-threshold
    // sampling keeps EVERY row of a 1/16 subset of KEYS (hv < 2^48 of
    // the 52-bit portable hash), so sampled keys carry their exact
    // counts and est = 16·Σ_sampled c(u)² is unbiased. Deterministic
    // given md5 — both engines agree exactly; err_ppm self-measures
    // the estimator against the true size. One hash aggregate over
    // the key-grain counts; the sketch is ~|keys|/16 rows.
    QuerySpec.sql(
      "sketch_join_card",
      """WITH c AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |h AS (
        |  SELECT c,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM c),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys_sampled,
        |    CAST(COALESCE(SUM(c * c), 0) * 16 AS BIGINT) AS est_size
        |  FROM h WHERE hv < 281474976710656),
        |t AS (SELECT CAST(SUM(c * c) AS BIGINT) AS true_size FROM c)
        |SELECT n_keys_sampled, est_size, true_size,
        |  CAST(abs(est_size - true_size) * 1000000 // true_size
        |    AS BIGINT) AS err_ppm
        |FROM s, t""".stripMargin) { (s, dir) =>
      val counts = events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val sampled = counts
        .filter(graft.functions.Md5Prefix.md5_prefix_long(
          col("user_id").cast("string"), 13) < lit(281474976710656L))
        .agg(count(lit(1)).as("n_keys_sampled"),
          (coalesce(sum(col("c") * col("c")), lit(0L)) * 16)
            .as("est_size"))
      val truth = counts
        .agg(sum(col("c") * col("c")).as("true_size"))
      sampled.crossJoin(truth)
        .select(col("n_keys_sampled"), col("est_size"), col("true_size"),
          expr("CAST(abs(est_size - true_size) * 1000000 div true_size AS BIGINT)")
            .as("err_ppm"))
    },

    QuerySpec.sql(
      "sketch_kmv_setops",
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id * 1000
        |      + CAST(EXTRACT(doy FROM ts) AS BIGINT) AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM events),
        |sk AS (SELECT event_type, hv FROM (
        |    SELECT event_type, hv,
        |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |    FROM h) t WHERE rn <= 64),
        |types AS (SELECT DISTINCT event_type FROM h),
        |pairs AS (
        |  SELECT a.event_type AS et_a, b.event_type AS et_b
        |  FROM types a JOIN types b ON a.event_type < b.event_type),
        |u AS (
        |  SELECT p.et_a, p.et_b, s.hv
        |  FROM pairs p JOIN sk s ON s.event_type = p.et_a
        |  UNION
        |  SELECT p.et_a, p.et_b, s.hv
        |  FROM pairs p JOIN sk s ON s.event_type = p.et_b),
        |m AS (SELECT et_a, et_b, hv FROM (
        |    SELECT et_a, et_b, hv,
        |      ROW_NUMBER() OVER (PARTITION BY et_a, et_b ORDER BY hv) AS rn
        |    FROM u) t WHERE rn <= 64),
        |flags AS (
        |  SELECT m.et_a, m.et_b, m.hv,
        |    CASE WHEN sa.hv IS NOT NULL AND sb.hv IS NOT NULL
        |      THEN 1 ELSE 0 END AS in_both
        |  FROM m
        |  LEFT JOIN sk sa ON sa.event_type = m.et_a AND sa.hv = m.hv
        |  LEFT JOIN sk sb ON sb.event_type = m.et_b AND sb.hv = m.hv),
        |stats AS (
        |  SELECT et_a, et_b, CAST(COUNT(*) AS BIGINT) AS n_merged,
        |    MAX(hv) AS kth, CAST(SUM(in_both) AS BIGINT) AS n_both
        |  FROM flags GROUP BY 1, 2),
        |du AS (SELECT DISTINCT event_type, user_id * 1000
        |    + CAST(EXTRACT(doy FROM ts) AS BIGINT) AS elem FROM events),
        |cnt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM du GROUP BY 1),
        |ix AS (
        |  SELECT a.event_type AS et_a, b.event_type AS et_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_inter
        |  FROM du a JOIN du b
        |    ON a.elem = b.elem AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT s.et_a, s.et_b, s.n_merged, s.n_both,
        |    CASE WHEN s.n_merged < 64 THEN CAST(s.n_merged AS DOUBLE)
        |      ELSE (CAST(63 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE))
        |        / CAST(s.kth AS DOUBLE) END AS union_est,
        |    CASE WHEN s.n_merged = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE CAST(s.n_both AS DOUBLE) / s.n_merged END AS jaccard_est,
        |    CASE WHEN ca.n + cb.n - COALESCE(i.n_inter, 0) = 0
        |        THEN CAST(0 AS DOUBLE)
        |      ELSE CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
        |        / (ca.n + cb.n - COALESCE(i.n_inter, 0)) END AS jaccard_exact
        |  FROM stats s
        |  JOIN cnt ca ON ca.event_type = s.et_a
        |  JOIN cnt cb ON cb.event_type = s.et_b
        |  LEFT JOIN ix i ON i.et_a = s.et_a AND i.et_b = s.et_b)
        |SELECT et_a, et_b, n_merged, n_both, union_est, jaccard_est,
        |  jaccard_est * union_est AS inter_est, jaccard_exact,
        |  ABS(jaccard_est - jaccard_exact) <= 0.35 AS within_bound
        |FROM est
        |ORDER BY et_a, et_b""".stripMargin) { (s, dir) =>
      val k = 64
      val elem = col("user_id") * 1000 + dayofyear(col("ts")).cast("long")
      // ONE distinct of (event_type, elem) feeds the sketch build, the
      // exact counts AND the exact intersection: the three consumers
      // are the identical subplan, so ReuseExchange materializes the
      // corpus-side shuffle once (the oracle hashes raw rows then
      // distincts — same relation, md5 is deterministic). The md5 also
      // moves AFTER the distinct: |distinct| hashes, not |corpus|.
      val du = events(s, dir)
        .select(col("event_type"), elem.as("elem")).distinct()
      val h = du
        .select(col("event_type"),
          graft.functions.Md5Prefix.md5_prefix_long(
            col("elem").cast("string"), 13).as("hv"))
        .distinct()
      // per-type bottom-k without a full per-type sort: local rank in
      // 16 salt buckets (≤ 16k survivors), then the tiny global rank
      val wLocal = Window
        .partitionBy(col("event_type"), pmod(xxhash64(col("hv")), lit(16)))
        .orderBy(col("hv"))
      val wGlobal = Window.partitionBy(col("event_type")).orderBy(col("hv"))
      val sk = h.withColumn("lrk", row_number().over(wLocal))
        .filter(col("lrk") <= k)
        .withColumn("rn", row_number().over(wGlobal))
        .filter(col("rn") <= k)
        .select(col("event_type"), col("hv"))
        .cache()
      val types = sk.select(col("event_type")).distinct()
      val pairs = types.select(col("event_type").as("et_a"))
        .join(types.select(col("event_type").as("et_b")),
          col("et_a") < col("et_b"))
      // union sketch: bottom-k of the two sketches' union (≤ 2k rows
      // per pair — the window is bounded by construction)
      val u = broadcast(pairs)
        .join(sk.withColumnRenamed("event_type", "et_a"), Seq("et_a"))
        .select(col("et_a"), col("et_b"), col("hv"))
        .unionByName(broadcast(pairs)
          .join(sk.withColumnRenamed("event_type", "et_b"), Seq("et_b"))
          .select(col("et_a"), col("et_b"), col("hv")))
        .distinct()
      val wPair = Window.partitionBy(col("et_a"), col("et_b")).orderBy(col("hv"))
      val m = u.withColumn("rn", row_number().over(wPair))
        .filter(col("rn") <= k)
        .select(col("et_a"), col("et_b"), col("hv"))
      val flags = m
        .join(sk.select(col("event_type").as("et_a"), col("hv"),
          lit(1).as("fa")), Seq("et_a", "hv"), "left")
        .join(sk.select(col("event_type").as("et_b"), col("hv"),
          lit(1).as("fb")), Seq("et_b", "hv"), "left")
        .withColumn("in_both",
          when(col("fa").isNotNull && col("fb").isNotNull, 1).otherwise(0))
      val stats = flags.groupBy(col("et_a"), col("et_b"))
        .agg(count(lit(1)).as("n_merged"), max(col("hv")).as("kth"),
          sum(col("in_both")).as("n_both"))
      val cnt = du.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ix = du.select(col("event_type").as("et_a"), col("elem"))
        .join(du.select(col("event_type").as("et_b"), col("elem")),
          Seq("elem"))
        .filter(col("et_a") < col("et_b"))
        .groupBy(col("et_a"), col("et_b"))
        .agg(count(lit(1)).as("n_inter"))
      stats
        .join(broadcast(cnt.select(col("event_type").as("et_a"),
          col("n").as("na"))), Seq("et_a"))
        .join(broadcast(cnt.select(col("event_type").as("et_b"),
          col("n").as("nb"))), Seq("et_b"))
        .join(ix, Seq("et_a", "et_b"), "left")
        .withColumn("union_est",
          when(col("n_merged") < k, col("n_merged").cast("double"))
            .otherwise(lit(63.0) * lit(4503599627370496.0) /
              col("kth").cast("double")))
        .withColumn("jaccard_est",
          when(col("n_merged") === 0, lit(0.0))
            .otherwise(col("n_both").cast("double") / col("n_merged")))
        .withColumn("jaccard_exact",
          when(col("na") + col("nb") - coalesce(col("n_inter"), lit(0L)) === 0,
            lit(0.0))
            .otherwise(coalesce(col("n_inter"), lit(0L)).cast("double") /
              (col("na") + col("nb") - coalesce(col("n_inter"), lit(0L)))))
        .select(col("et_a"), col("et_b"), col("n_merged"), col("n_both"),
          col("union_est"), col("jaccard_est"),
          (col("jaccard_est") * col("union_est")).as("inter_est"),
          col("jaccard_exact"),
          (abs(col("jaccard_est") - col("jaccard_exact")) <= 0.35)
            .as("within_bound"))
        .orderBy(col("et_a"), col("et_b"))
    },

    // HyperLogLog-style register sketch, m = 64 (p = 6): distinct
    // users per event type estimated from 6-bit-bucketed leading-zero
    // ranks of the same 52-bit md5 hash KMV uses. Unlike KMV the state
    // is FIXED-SIZE (64 registers per group at ANY cardinality) and
    // merges by register-max — one map-side-combinable hash aggregate,
    // the mergeable shape partial/streaming aggregation needs at
    // 100 TB. Deterministic end to end: registers are integer maxes;
    // the harmonic-mean estimator's Σ2^-M_j is computed exactly in
    // scaled integers (2^(47-M_j), total ≤ 64·2^47 < 2^53); the one
    // double division runs on identical operands in both engines; the
    // linear-counting small-range branch's ln is rounded to 6 decimals
    // (the double→decimal rounding rule every double gate relies on).
    // The exact distinct count rides along, so the gate self-measures:
    // within_bound asserts 4·|err| ≤ nd, generous vs the 1.04/√64
    // ≈ 13 % theoretical standard error.
    QuerySpec.sql(
      "sketch_hll_distinct",
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, hv % 64 AS bucket,
        |    MAX(CASE WHEN hv >> 6 = 0 THEN 47
        |      ELSE 47 - length(bin(hv >> 6)) END) AS mj
        |  FROM h GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS used,
        |    CAST(SUM(CAST(POW(2, 47 - mj) AS BIGINT)) AS BIGINT) AS s_used
        |  FROM r GROUP BY 1),
        |fin AS (
        |  SELECT event_type, used,
        |    CASE WHEN CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |          * CAST(140737488355328 AS DOUBLE)
        |          / CAST(s_used + (64 - used) * 140737488355328 AS DOUBLE)
        |        <= CAST(160 AS DOUBLE) AND used < 64
        |      THEN CAST(64 AS DOUBLE)
        |        * ln(CAST(64 AS DOUBLE) / CAST(64 - used AS DOUBLE))
        |      ELSE CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |          * CAST(140737488355328 AS DOUBLE)
        |          / CAST(s_used + (64 - used) * 140737488355328 AS DOUBLE)
        |      END AS est
        |  FROM agg),
        |nd AS (
        |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |    AS n_distinct
        |  FROM events GROUP BY 1)
        |SELECT f.event_type, n.n_distinct, f.used AS n_regs_used,
        |  CAST(CAST(f.est AS DECIMAL(18,6)) AS DOUBLE) AS hll_est,
        |  abs(CAST(CAST(f.est AS DECIMAL(18,6)) AS DOUBLE)
        |      - CAST(n.n_distinct AS DOUBLE)) * CAST(4 AS DOUBLE)
        |    <= CAST(n.n_distinct AS DOUBLE) AS within_bound
        |FROM fin f JOIN nd n ON n.event_type = f.event_type
        |ORDER BY f.event_type""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val h = ev.select(col("event_type"),
        graft.functions.Md5Prefix.md5_prefix_long(
          col("user_id").cast("string"), 13).as("hv"))
      // register build: NO distinct pre-pass — max is idempotent, so
      // duplicate hashes fold map-side in the same hash aggregate
      val regs = h
        .select(col("event_type"), pmod(col("hv"), lit(64L)).as("bucket"),
          when(shiftright(col("hv"), 6) === 0, lit(47))
            .otherwise(lit(47) - length(bin(shiftright(col("hv"), 6))))
            .as("rho"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("mj"))
      val agg = regs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("used"),
          sum(expr("CAST(POW(2, 47 - mj) AS BIGINT)")).as("s_used"))
      val est = agg
        .withColumn("raw",
          lit(0.709) * lit(4096.0) * lit(140737488355328.0) /
            (col("s_used") +
              (lit(64L) - col("used")) * lit(140737488355328L)).cast("double"))
        .withColumn("est",
          when(col("raw") <= lit(160.0) && col("used") < 64,
            lit(64.0) * log(lit(64.0) / (lit(64L) - col("used")).cast("double")))
            .otherwise(col("raw")))
        .withColumn("hll_est",
          col("est").cast(org.apache.spark.sql.types.DecimalType(18, 6))
            .cast("double"))
      // exact side of the self-measure (the expensive full distinct —
      // the sketch above is the production path)
      val nd = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_distinct"))
      est.join(nd, Seq("event_type"))
        .select(col("event_type"), col("n_distinct"),
          col("used").as("n_regs_used"), col("hll_est"),
          (abs(col("hll_est") - col("n_distinct").cast("double")) * lit(4.0) <=
            col("n_distinct").cast("double")).as("within_bound"))
        .orderBy(col("event_type"))
    },

    // Mergeable log-histogram quantile sketch: per event type, values
    // collapse into at most ~1 000 fixed buckets (16 sub-buckets per
    // power of two over the 6-decimal integer domain), so quantile
    // estimation is ONE map-side-combinable hash aggregate plus a
    // window over the bounded bucket table — never a per-group sort of
    // row-scale data, the shape that keeps p50/p90/p99 cheap at 100 TB
    // where the exact operator (quantile_disc_grouped) must range-
    // partition all values. Estimate = the chosen bucket's lower
    // bound, guaranteed within one bucket width (≤ 1/16 relative
    // error) of the true quantile. Everything — bucket id, lower
    // bound, rank thresholds — is integer arithmetic on micros, so
    // both engines agree bit-for-bit; `in_bucket` re-derives the
    // guarantee IN-PLAN against the exact quantile (same self-
    // measuring discipline as the ANN recall gates: the exact side is
    // the measurement harness, the histogram is the production path).
    QuerySpec.sql(
      "ts_quantile_sketch", {
        val m = "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH ev AS (
           |  SELECT event_type, $m AS m FROM events WHERE value > 0),
           |b AS (
           |  SELECT event_type,
           |    CASE WHEN m < 16 THEN m
           |      ELSE (length(bin(m))-1)*16 + ((m >> (length(bin(m))-5)) & 15)
           |    END AS bucket,
           |    CASE WHEN m < 16 THEN m
           |      ELSE (16 + ((m >> (length(bin(m))-5)) & 15))
           |        << (length(bin(m))-5)
           |    END AS lb
           |  FROM ev),
           |hist AS (
           |  SELECT event_type, bucket, lb, COUNT(*) AS cnt
           |  FROM b GROUP BY 1, 2, 3),
           |tot AS (SELECT event_type, SUM(cnt) AS n FROM hist GROUP BY 1),
           |cum AS (
           |  SELECT event_type, bucket, lb,
           |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
           |  FROM hist),
           |pq AS (SELECT unnest([50, 90, 99]) AS p_pct),
           |est AS (
           |  SELECT c.event_type, p.p_pct, MIN(c.lb) AS est_m
           |  FROM cum c JOIN tot t USING (event_type) CROSS JOIN pq p
           |  WHERE c.cum >= (p.p_pct * t.n + 99) // 100
           |  GROUP BY 1, 2),
           |vals AS (SELECT event_type, m, COUNT(*) AS c FROM ev GROUP BY 1, 2),
           |vcum AS (
           |  SELECT event_type, m,
           |    SUM(c) OVER (PARTITION BY event_type ORDER BY m) AS cum
           |  FROM vals),
           |ex AS (
           |  SELECT v.event_type, p.p_pct, MIN(v.m) AS exact_m
           |  FROM vcum v JOIN tot t USING (event_type) CROSS JOIN pq p
           |  WHERE v.cum >= (p.p_pct * t.n + 99) // 100
           |  GROUP BY 1, 2)
           |SELECT e.event_type, e.p_pct,
           |  CAST(est_m AS DOUBLE) / 1000000.0 AS est,
           |  CAST(exact_m AS DOUBLE) / 1000000.0 AS exact,
           |  est_m <= exact_m AND (CASE WHEN est_m < 16 THEN exact_m = est_m
           |    ELSE exact_m < est_m + (CAST(1 AS BIGINT)
           |      << (length(bin(est_m))-5)) END)
           |    AS in_bucket
           |FROM est e JOIN ex x ON x.event_type = e.event_type
           |  AND x.p_pct = e.p_pct
           |ORDER BY 1, 2""".stripMargin
      }) { (s, dir) =>
      val ps = Seq(50, 90, 99)
      val ev = events(s, dir).filter(col("value") > 0)
        .select(col("event_type"),
          graft.functions.Cols.micros6(col("value")).as("m"))
      val hist = ev.selectExpr("event_type",
          """CASE WHEN m < 16 THEN m
            |  ELSE (length(bin(m))-1)*16 + ((m >> (length(bin(m))-5)) & 15)
            |END AS bucket""".stripMargin,
          """CASE WHEN m < 16 THEN m
            |  ELSE (16 + ((m >> (length(bin(m))-5)) & 15))
            |    << (length(bin(m))-5)
            |END AS lb""".stripMargin)
        .groupBy(col("event_type"), col("bucket"), col("lb"))
        .agg(count(lit(1)).as("cnt"))
      val tot = hist.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
      val wB = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      val pdf = s.range(1)
        .select(explode(array(ps.map(lit): _*)).as("p_pct"))
      val est = hist.withColumn("cum", sum(col("cnt")).over(wB))
        .join(broadcast(tot), Seq("event_type"))
        .crossJoin(broadcast(pdf))
        .filter(col("cum") >= expr("(p_pct * n + 99) div 100"))
        .groupBy(col("event_type"), col("p_pct"))
        .agg(min(col("lb")).as("est_m"))
      val wV = Window.partitionBy(col("event_type")).orderBy(col("m"))
      val ex = ev.groupBy(col("event_type"), col("m"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wV))
        .join(broadcast(tot), Seq("event_type"))
        .crossJoin(broadcast(pdf))
        .filter(col("cum") >= expr("(p_pct * n + 99) div 100"))
        .groupBy(col("event_type"), col("p_pct"))
        .agg(min(col("m")).as("exact_m"))
      est.join(ex, Seq("event_type", "p_pct"))
        .selectExpr("event_type", "p_pct",
          "CAST(est_m AS DOUBLE) / 1000000.0 AS est",
          "CAST(exact_m AS DOUBLE) / 1000000.0 AS exact",
          """est_m <= exact_m AND (CASE WHEN est_m < 16 THEN exact_m = est_m
            |  ELSE exact_m < est_m + (CAST(1 AS BIGINT)
            |    << (length(bin(est_m))-5)) END)
            |  AS in_bucket""".stripMargin)
        .orderBy(col("event_type"), col("p_pct"))
    },

    // Sliding-window quantiles from MERGED per-day log-histograms —
    // the quantile counterpart of sketch_hll_window, and the second
    // half of the mergeability story: the per-day histogram is the
    // persisted sketch table (bounded buckets per series-day), and
    // any 7-day window's p50/p90/p99 comes from SUMMING bucket counts
    // across the window's days — the raw events are scanned once,
    // ever. Windows served by explode → equi-join; the per-window
    // cumulative walk runs over ≤ |buckets| rows. Bucket-lower-bound
    // estimates, deterministic integer math throughout (the base
    // gate pins the bucket-bound accuracy contract).
    QuerySpec.sql(
      "sketch_quantile_window", {
        val m = "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH ev AS (
           |  SELECT event_type,
           |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           |    $m AS m
           |  FROM events WHERE value > 0),
           |b AS (
           |  SELECT event_type, d,
           |    CASE WHEN m < 16 THEN m
           |      ELSE (length(bin(m))-1)*16 + ((m >> (length(bin(m))-5)) & 15)
           |    END AS bucket,
           |    CASE WHEN m < 16 THEN m
           |      ELSE (16 + ((m >> (length(bin(m))-5)) & 15))
           |        << (length(bin(m))-5)
           |    END AS lb
           |  FROM ev),
           |hist AS (
           |  SELECT event_type, d, bucket, lb, CAST(COUNT(*) AS BIGINT)
           |      AS cnt
           |  FROM b GROUP BY 1, 2, 3, 4),
           |days AS (SELECT DISTINCT event_type, d FROM ev),
           |srv AS (
           |  SELECT h.event_type, h.d + o AS wd, h.bucket, h.lb, h.cnt
           |  FROM hist h,
           |    LATERAL (SELECT unnest(generate_series(0, 6)) AS o) g),
           |wh AS (
           |  SELECT s.event_type, s.wd, s.bucket, s.lb,
           |    CAST(SUM(s.cnt) AS BIGINT) AS cnt
           |  FROM srv s JOIN days dy
           |    ON dy.event_type = s.event_type AND dy.d = s.wd
           |  GROUP BY 1, 2, 3, 4),
           |tot AS (SELECT event_type, wd, CAST(SUM(cnt) AS BIGINT) AS n
           |  FROM wh GROUP BY 1, 2),
           |cum AS (
           |  SELECT event_type, wd, bucket, lb,
           |    SUM(cnt) OVER (PARTITION BY event_type, wd
           |      ORDER BY bucket) AS cum
           |  FROM wh),
           |pq AS (SELECT unnest([50, 90, 99]) AS p_pct)
           |SELECT c.event_type, c.wd AS window_day, p.p_pct,
           |  CAST(MIN(c.lb) AS DOUBLE) / 1000000.0 AS est
           |FROM cum c JOIN tot t
           |  ON t.event_type = c.event_type AND t.wd = c.wd
           |CROSS JOIN pq p
           |WHERE c.cum >= (p.p_pct * t.n + 99) // 100
           |GROUP BY 1, 2, 3
           |ORDER BY 1, 2, 3""".stripMargin
      }) { (s, dir) =>
      val ev = events(s, dir).filter(col("value") > 0)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("d"),
          graft.functions.Cols.micros6(col("value")).as("m"))
      val hist = ev.selectExpr("event_type", "d",
          """CASE WHEN m < 16 THEN m
            |  ELSE (length(bin(m))-1)*16 + ((m >> (length(bin(m))-5)) & 15)
            |END AS bucket""".stripMargin,
          """CASE WHEN m < 16 THEN m
            |  ELSE (16 + ((m >> (length(bin(m))-5)) & 15))
            |    << (length(bin(m))-5)
            |END AS lb""".stripMargin)
        .groupBy(col("event_type"), col("d"), col("bucket"), col("lb"))
        .agg(count(lit(1)).as("cnt"))
      val days = ev.select(col("event_type"), col("d")).distinct()
      val wh = hist
        .select(col("event_type"), col("bucket"), col("lb"), col("cnt"),
          explode(expr("sequence(d, d + 6)")).as("wd"))
        .join(days.withColumnRenamed("d", "wd"), Seq("event_type", "wd"))
        .groupBy(col("event_type"), col("wd"), col("bucket"), col("lb"))
        .agg(sum(col("cnt")).as("cnt"))
      val tot = wh.groupBy(col("event_type"), col("wd"))
        .agg(sum(col("cnt")).as("n"))
      val wB = Window.partitionBy(col("event_type"), col("wd"))
        .orderBy(col("bucket"))
      val pdf = s.range(1)
        .select(explode(array(Seq(50, 90, 99).map(lit): _*)).as("p_pct"))
      wh.withColumn("cum", sum(col("cnt")).over(wB))
        .join(tot, Seq("event_type", "wd"))
        .crossJoin(broadcast(pdf))
        .filter(col("cum") >= expr("(p_pct * n + 99) div 100"))
        .groupBy(col("event_type"), col("wd").as("window_day"),
          col("p_pct"))
        .agg((min(col("lb")).cast("double") / 1000000.0).as("est"))
        .orderBy(col("event_type"), col("window_day"), col("p_pct"))
    },

    // Gap fill (forward fill): dense per-series calendar, missing days
    // carry the last observed value. The window is partitioned by
    // series — per-series sequential fill parallelized across series;
    // a single pathological series falls back to the two-pass
    // PrefixSum pattern (functions/PrefixSum.scala) if it ever
    // dominates a partition.
    QuerySpec.sql(
      "ts_gap_fill",
      s"""$calendarJoinedSql
         |SELECT event_type, day, total,
         |  last_value(total IGNORE NULLS) OVER (
         |    PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
         |  total IS NULL AS is_gap
         |FROM j ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val wPrev = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      calendarJoined(s, dir)
        .withColumn("filled", last(col("total"), ignoreNulls = true).over(wPrev))
        .withColumn("is_gap", col("total").isNull)
        .orderBy(col("event_type"), col("day"))
    },

    // Linear interpolation to the dense grid: gap days take the
    // straight line between the bracketing observations (forward fill
    // past the last observation; leading gaps cannot occur — the
    // calendar starts at each series' first observed day). The
    // interpolation weight is a single exact-integer-ratio division,
    // then one multiply + two adds — every step a correctly-rounded
    // IEEE op on identical inputs in both engines.
    QuerySpec.sql(
      "ts_interp_linear",
      s"""$calendarJoinedSql,
         |f AS (
         |  SELECT event_type, day, total,
         |    last_value(total IGNORE NULLS) OVER w_prev AS pv,
         |    last_value(CASE WHEN total IS NOT NULL THEN day END IGNORE NULLS)
         |      OVER w_prev AS pd,
         |    first_value(total IGNORE NULLS) OVER w_next AS nv,
         |    first_value(CASE WHEN total IS NOT NULL THEN day END IGNORE NULLS)
         |      OVER w_next AS nd
         |  FROM j
         |  WINDOW w_prev AS (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    w_next AS (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT event_type, day, total,
         |  CASE WHEN total IS NOT NULL THEN total
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
         |         pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
         |           / CAST(date_diff('day', pd, nd) AS DOUBLE))
         |       ELSE pv END AS interp
         |FROM f ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val wPrev = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      calendarJoined(s, dir)
        .withColumn("pv", last(col("total"), ignoreNulls = true).over(wPrev))
        .withColumn("pd", last(when(col("total").isNotNull, col("day")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("total"), ignoreNulls = true).over(wNext))
        .withColumn("nd", first(when(col("total").isNotNull, col("day")),
          ignoreNulls = true).over(wNext))
        .withColumn("interp",
          when(col("total").isNotNull, col("total"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                (datediff(col("day"), col("pd")).cast("double") /
                  datediff(col("nd"), col("pd")).cast("double")))
            .otherwise(col("pv")))
        .select(col("event_type"), col("day"), col("total"), col("interp"))
        .orderBy(col("event_type"), col("day"))
    },

    // Rolling z-score anomaly flags on daily event counts. The z>2
    // test is algebraically cleared of division and sqrt:
    //   (x-mu)^2 > 4*sigma^2  <=>  (n*x - S)^2 > 4*(n*Q - S^2)
    // with S = rolling sum, Q = rolling sum of squares — pure integer
    // comparison, so partitioning/aggregation order cannot flip a
    // flag. Trailing 7-day window per series, warmup (n<4) never
    // flagged.
    QuerySpec.sql(
      "ts_anomaly_zscore",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n_events,
        |    SUM(n_events) OVER w7 AS s,
        |    SUM(n_events * n_events) OVER w7 AS q,
        |    COUNT(*) OVER w7 AS n
        |  FROM daily
        |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, n_events, CAST(n AS BIGINT) AS win_n,
        |  n >= 4 AND (n * n_events - s) * (n * n_events - s)
        |    > 4 * (n * q - s * s) AS is_anomaly
        |FROM w ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      anomalyFlags(events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events")))
        .orderBy(col("event_type"), col("day"))
    },

    // Exponential smoothing (EWMA, α = 1/2) per series over daily
    // counts, in EXACT integer arithmetic: ewma_1 = x_1,
    // ewma_i = (ewma_{i-1} + x_i) div 2 (floor). The float form is a
    // recursive product of roundings no two engines replay
    // identically; the floored-integer form is deterministic
    // everywhere. Spark has no recursion, but the recursion is
    // per-SERIES over the DAILY frame — bounded by the calendar, not
    // by event volume — so a higher-order `aggregate` fold over each
    // series' sorted day array computes it in one hash aggregate +
    // one explode, no window, no shuffle beyond the daily rollup.
    // The DuckDB oracle keeps the textbook recursive-CTE definition.
    QuerySpec.sql(
      "ts_ewma",
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, day, n_events,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |      CAST(COUNT(*) AS BIGINT) AS n_events
        |    FROM events GROUP BY 1, 2) d),
        |r AS (
        |  SELECT event_type, rn, day, n_events, n_events AS ewma
        |  FROM daily WHERE rn = 1
        |  UNION ALL
        |  SELECT d.event_type, d.rn, d.day, d.n_events,
        |    (r.ewma + d.n_events) // 2
        |  FROM r JOIN daily d
        |    ON d.event_type = r.event_type AND d.rn = r.rn + 1)
        |SELECT event_type, day, n_events, CAST(ewma AS BIGINT) AS ewma
        |FROM r ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      ewmaFold(events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events")))
        .orderBy(col("event_type"), col("day"))
    },

    // Double exponential smoothing (Holt linear, α = β = ½) in exact
    // floored-integer arithmetic — the trend-aware forecasting
    // companion to ts_ewma. Level/trend recursion (values scaled ×2 so
    // the half-weights stay integral):
    //   l_1 = 2·x_1, b_1 = 0
    //   l_i = x_i + (l_{i-1} + b_{i-1}) div 2
    //   b_i = (b_{i-1} + (l_i - l_{i-1})) div 2
    // Same per-series `aggregate` fold over the calendar-bounded daily
    // frame; same recursive-CTE oracle.
    // Stationary distribution of the event-transition Markov chain —
    // where the process-mining family's transition matrix converges:
    // 5 power-iteration rounds in integer mass (each contribution is
    // floor(mass·count/row_total) — no float accumulation, so the
    // fixpoint is bit-deterministic at any parallelism). The state
    // space is the event-type set, so every round is a join against
    // the |states|² transition-count table — trivially broadcastable
    // at any event volume; only the ONE pass building the counts
    // touches the raw events.
    QuerySpec.sql(
      "events_markov_stationary", {
        val iters = 5
        def step(prev: String) =
          s"""SELECT s.st,
             |  CAST(COALESCE(SUM(p.mass * tc.c // rt.n), 0) AS BIGINT)
             |    AS mass
             |FROM states s
             |LEFT JOIN tc ON tc.t = s.st
             |LEFT JOIN rt ON rt.f = tc.f
             |LEFT JOIN $prev p ON p.st = tc.f
             |GROUP BY 1""".stripMargin
        val ladder = (1 to iters)
          .map(i => s"p$i AS (${step(s"p${i - 1}")})").mkString(",\n")
        s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
           |    event_id
           |  FROM events),
           |sq AS (SELECT event_type AS f,
           |    LEAD(event_type) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id) AS t
           |  FROM e),
           |tc AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM sq WHERE t IS NOT NULL GROUP BY 1, 2),
           |rt AS (SELECT f, CAST(SUM(c) AS BIGINT) AS n
           |  FROM tc GROUP BY 1),
           |states AS (SELECT DISTINCT event_type AS st FROM e),
           |p0 AS (SELECT st, CAST(1000000000000 AS BIGINT) AS mass
           |  FROM states),
           |$ladder
           |SELECT st AS state, mass FROM p$iters
           |ORDER BY state""".stripMargin
      }) { (s, dir) =>
      val iters = 5
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val sq = events(s, dir)
        .select(col("user_id"), col("event_type").as("f"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("t", lead(col("f"), 1).over(w))
        .filter(col("t").isNotNull)
      val tc = sq.groupBy(col("f"), col("t"))
        .agg(count(lit(1)).as("c")).cache()
      val rt = tc.groupBy(col("f")).agg(sum(col("c")).as("n"))
      val states = events(s, dir)
        .select(col("event_type").as("st")).distinct()
      var p = states.withColumn("mass", lit(1000000000000L))
      for (_ <- 1 to iters) {
        val contrib = tc.join(rt, Seq("f"))
          .join(p.select(col("st").as("f"), col("mass")), Seq("f"))
          .select(col("t").as("st"),
            expr("mass * c div n").as("m"))
          .groupBy(col("st")).agg(sum(col("m")).as("sm"))
        // rounds chain in one tree (r16): the 5-round ladder over the
        // |states|-bounded frame planned+checkpointed per round for no
        // benefit; tc stays cached (the one row-scale input)
        p = states.join(contrib, Seq("st"), "left")
          .select(col("st"),
            coalesce(col("sm"), lit(0L)).as("mass"))
      }
      p.select(col("st").as("state"), col("mass"))
        .orderBy(col("state"))
    },

    // LTTB downsampling (largest-triangle-three-buckets, Steinarsson
    // 2013) — THE dashboard downsampler: reduce each daily series to
    // 10 points that preserve visual shape (peaks survive, plateaus
    // collapse). Selection is inherently sequential — bucket k's pick
    // depends on bucket k−1's — so the 8 middle buckets unroll as a
    // chained ladder (like the Hilbert/k-core CTE ladders): per step
    // one keyed join to the carried anchor + one argmax. The triangle
    // area is kept EXACT by multiplying through by the next-bucket
    // size (|（m·xa − Σx)(yb − ya) − (xa − xb)(Σy − m·ya)|, all
    // integers — x is an epoch day, y a count), ties to the earliest
    // point — so both engines select identical points with zero float
    // ops. Requires ≥ 10 points per series (30-day series here).
    QuerySpec.sql(
      "ts_downsample_lttb", {
        val nb = 8
        val xs = (0 until nb).map { k =>
          if (k < nb - 1)
            s"""x$k AS (SELECT event_type, CAST(SUM(x) AS BIGINT) AS sx,
               |    CAST(SUM(y) AS BIGINT) AS sy,
               |    CAST(COUNT(*) AS BIGINT) AS m
               |  FROM p WHERE i >= 1 + (${k + 1} * (np - 2)) // $nb
               |    AND i < 1 + (${k + 2} * (np - 2)) // $nb
               |  GROUP BY 1)""".stripMargin
          else
            s"""x$k AS (SELECT event_type, x AS sx, y AS sy,
               |    CAST(1 AS BIGINT) AS m
               |  FROM p WHERE i = np - 1)""".stripMargin
        }
        val steps = (0 until nb).map { k =>
          s"""s$k AS (
             |  SELECT event_type, x, y FROM (
             |    SELECT c.event_type, c.x, c.y,
             |      ROW_NUMBER() OVER (PARTITION BY c.event_type
             |        ORDER BY abs((nx.m * a.xa - nx.sx) * (c.y - a.ya)
             |          - (a.xa - c.x) * (nx.sy - nx.m * a.ya)) DESC,
             |          c.x) AS rn
             |    FROM p c
             |    JOIN a$k a USING (event_type)
             |    JOIN x$k nx USING (event_type)
             |    WHERE c.i >= 1 + ($k * (c.np - 2)) // $nb
             |      AND c.i < 1 + (${k + 1} * (c.np - 2)) // $nb) q
             |  WHERE rn = 1),
             |a${k + 1} AS (SELECT event_type, x AS xa, y AS ya
             |  FROM s$k)""".stripMargin
        }
        val sels = (0 until nb).map { k =>
          s"SELECT event_type, CAST(${k + 1} AS BIGINT) AS sel, x, y FROM s$k"
        }
        s"""WITH d AS (
           |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE)
           |      AS day,
           |    CAST(COUNT(*) AS BIGINT) AS y
           |  FROM events GROUP BY 1, 2),
           |pts AS (
           |  SELECT event_type,
           |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
           |      - 1 AS i,
           |    CAST(day - DATE '1970-01-01' AS BIGINT) AS x, y
           |  FROM d),
           |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS np
           |  FROM pts GROUP BY 1),
           |p AS (SELECT * FROM pts JOIN n USING (event_type)),
           |a0 AS (SELECT event_type, x AS xa, y AS ya FROM p
           |  WHERE i = 0),
           |${xs.mkString(",\n")},
           |${steps.mkString(",\n")}
           |SELECT * FROM (
           |  SELECT event_type, CAST(0 AS BIGINT) AS sel, x, y FROM p
           |  WHERE i = 0
           |  UNION ALL ${sels.mkString("\n  UNION ALL ")}
           |  UNION ALL SELECT event_type, CAST(9 AS BIGINT), x, y
           |  FROM p WHERE i = np - 1) u
           |ORDER BY event_type, sel""".stripMargin
      }) { (s, dir) =>
      // Selection is inherently sequential in the BUCKET dimension but
      // embarrassingly parallel in the SERIES dimension — so since r17
      // the whole 8-step ladder runs inside ONE scalar expression
      // ([[graft.functions.LttbSelect]], the MmrSelect pattern) over
      // each series' collected (x, y) array, instead of 8 chained
      // join+argmax rounds each behind an eager Materialize.stable
      // localCheckpoint (~10 jobs, 8 materializations, 21 Exchange
      // nodes → 2 aggregate exchanges + the output sort). x is unique
      // per series and monotone in day, so the sort_array position
      // replaces the old ROW_NUMBER()-1 index; the integer area/edge
      // math is bit-identical (truncating div, exact longs).
      val nb = 8
      val pts = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).cast("long").as("x"),
          col("y"))
      pts.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("x"), col("y"))))
          .as("pts"))
        .select(col("event_type"),
          explode(graft.functions.LttbSelect.lttb_select(col("pts"), nb))
            .as("p"))
        .select(col("event_type"), col("p.sel").as("sel"),
          col("p.x").as("x"), col("p.y").as("y"))
        .orderBy(col("event_type"), col("sel"))
    },

    // Forecast backtest: MASE of the seasonal-naive (t−7) forecast
    // against the one-step naive (t−1) baseline over each series'
    // daily counts — the standard "is there exploitable weekly
    // structure?" number, scale-free and exact: both error sums are
    // integer, and the ratio ships ×1e6 as integer division. ppm < 1e6
    // means the weekly lag beats yesterday's value. One keyed
    // aggregate + one PARTITIONed window (lag 1 and 7 share it).
    QuerySpec.sql(
      "ts_backtest_mase",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, y,
        |    LAG(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
        |    LAG(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
        |  FROM daily),
        |agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(COALESCE(SUM(abs(y - y1)), 0) AS BIGINT) AS sae1,
        |    CAST(COALESCE(SUM(abs(y - y7)), 0) AS BIGINT) AS sae7
        |  FROM lagged GROUP BY 1)
        |SELECT event_type, n_days, sae1, sae7,
        |  CASE WHEN n_days > 7 AND sae1 > 0 THEN
        |    CAST(sae7 * (n_days - 1) * 1000000
        |      // (sae1 * (n_days - 7)) AS BIGINT) END AS mase_ppm
        |FROM agg
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .select(col("event_type"), col("y"),
          lag(col("y"), 1).over(w).as("y1"),
          lag(col("y"), 7).over(w).as("y7"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          coalesce(sum(abs(col("y") - col("y1"))), lit(0L)).as("sae1"),
          coalesce(sum(abs(col("y") - col("y7"))), lit(0L)).as("sae7"))
        .select(col("event_type"), col("n_days"), col("sae1"),
          col("sae7"),
          when(col("n_days") > 7 && col("sae1") > 0,
            expr("CAST(sae7 * (n_days - 1) * 1000000" +
              " div (sae1 * (n_days - 7)) AS BIGINT)")).as("mase_ppm"))
        .orderBy(col("event_type"))
    },

    QuerySpec.sql(
      "ts_holt_trend",
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, day, n_events,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |      CAST(COUNT(*) AS BIGINT) AS n_events
        |    FROM events GROUP BY 1, 2) d),
        |r AS (
        |  SELECT event_type, rn, day, n_events,
        |    2 * n_events AS lvl, CAST(0 AS BIGINT) AS trend
        |  FROM daily WHERE rn = 1
        |  UNION ALL
        |  SELECT d.event_type, d.rn, d.day, d.n_events,
        |    d.n_events + (r.lvl + r.trend) // 2,
        |    (r.trend + (d.n_events + (r.lvl + r.trend) // 2 - r.lvl)) // 2
        |  FROM r JOIN daily d
        |    ON d.event_type = r.event_type AND d.rn = r.rn + 1)
        |SELECT event_type, day, n_events, CAST(lvl AS BIGINT) AS lvl,
        |  CAST(trend AS BIGINT) AS trend
        |FROM r ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("n_events"))))
          .as("arr"))
        .withColumn("arr", boundedArr("ts_holt_trend"))
        .select(col("event_type"), explode(expr(
          """aggregate(arr,
            |  CAST(array() AS ARRAY<STRUCT<day: DATE, n_events: BIGINT,
            |    lvl: BIGINT, trend: BIGINT>>),
            |  (acc, x) -> array_append(acc,
            |    CASE WHEN size(acc) = 0
            |      THEN named_struct('day', x.day, 'n_events', x.n_events,
            |        'lvl', 2L * x.n_events, 'trend', 0L)
            |      ELSE named_struct('day', x.day, 'n_events', x.n_events,
            |        'lvl', x.n_events +
            |          (element_at(acc, -1).lvl + element_at(acc, -1).trend)
            |            div 2,
            |        'trend', (element_at(acc, -1).trend +
            |          (x.n_events +
            |            (element_at(acc, -1).lvl + element_at(acc, -1).trend)
            |              div 2 - element_at(acc, -1).lvl)) div 2)
            |    END))""".stripMargin)).as("e"))
        .select(col("event_type"), col("e.day").as("day"),
          col("e.n_events").as("n_events"), col("e.lvl").as("lvl"),
          col("e.trend").as("trend"))
        .orderBy(col("event_type"), col("day"))
    },

    // Grouped least-squares trend: per event-type, the OLS line (and
    // R²) of value against calendar day over the RAW event rows — the
    // "is this series drifting" screen run per metric before alerting
    // on it. Single hash aggregate: the five sufficient statistics
    // (n, Σx, Σx², Σy, Σxy, Σy²) are one map-side-combinable pass,
    // the integer sums exact in long and the value sums decimal-exact
    // (the dsum discipline), and the closed form is evaluated once
    // per GROUP in doubles via the SAME expression text both engines
    // compile — IEEE ops over identical inputs, so the hash compare
    // holds bit-exact. No window, no second pass; scales as a plain
    // grouped aggregate.
    QuerySpec.sql(
      "ts_linreg_trend",
      s"""WITH pts AS (
         |  SELECT event_type,
         |    date_diff('day', DATE '1970-01-01',
         |      CAST(date_trunc('day', ts) AS DATE)) AS x,
         |    value
         |  FROM events),
         |s AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    ${dsumSql("value")} AS sy,
         |    ${dsumSql("value * x")} AS sxy,
         |    ${dsumSql("value * value")} AS syy
         |  FROM pts GROUP BY 1)
         |SELECT event_type, n, ${LinReg.slope} AS slope,
         |  ${LinReg.intercept} AS intercept, ${LinReg.r2} AS r2
         |FROM s ORDER BY event_type""".stripMargin) { (s, dir) =>
      linregClosedForm(linregStats(linregPoints(events(s, dir))))
    },

    // Theil-Sen robust trend — the outlier-immune alternative to the
    // least-squares slope (one corrupt day can move ts_linreg_trend
    // arbitrarily; the pairwise-median slope has a 29% breakdown
    // point). The pair surface is the daily series self-joined with
    // itself — CALENDAR-BOUNDED (days²/2 per series, never row-scale),
    // the same value-domain-quadratic contract as the blocking-recall
    // gate. Each pair slope is one integer division (Δy·10⁶ div Δx —
    // Spark `div` and DuckDB `//` both truncate toward zero, so
    // negative slopes agree), and the median is the ⌈n/2⌉-th smallest
    // via a per-series rank — all integers end to end.
    QuerySpec.sql(
      "ts_theil_sen",
      """WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(date_trunc('day', ts) AS DATE)) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS event_type,
        |    (b.y - a.y) * 1000000 // (b.x - a.x) AS sp
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.x < b.x),
        |r AS (
        |  SELECT event_type, sp,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY sp)
        |      AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS np
        |  FROM p),
        |d AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_points, CAST(np AS BIGINT) AS n_pairs,
        |  CAST(sp AS BIGINT) AS theil_slope_ppm
        |FROM r JOIN d USING (event_type)
        |WHERE rk = (np + 1) // 2
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          datediff(to_date(date_trunc("day", col("ts"))),
            lit("1970-01-01").cast("date")).as("x"))
        .agg(count(lit(1)).as("y"))
      val a = daily.select(col("event_type"), col("x").as("xa"),
        col("y").as("ya"))
      val b = daily.select(col("event_type").as("et_b"),
        col("x").as("xb"), col("y").as("yb"))
      val pairs = a.join(b,
          col("event_type") === col("et_b") && col("xa") < col("xb"))
        .select(col("event_type"),
          expr("(yb - ya) * 1000000 div (xb - xa)").as("sp"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("sp"))
      val wc = Window.partitionBy(col("event_type"))
      val d = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_points"))
      pairs
        .withColumn("rk", row_number().over(w))
        .withColumn("np", count(lit(1)).over(wc))
        .filter(expr("rk = (np + 1) div 2"))
        .join(broadcast(d), Seq("event_type"))
        .select(col("event_type"), col("n_points"),
          col("np").as("n_pairs"), col("sp").as("theil_slope_ppm"))
        .orderBy(col("event_type"))
    },

    // Lag-1 autocorrelation of each series' daily-count sequence — the
    // "is today predictive of tomorrow" diagnostic behind seasonality
    // and burst detection. Pearson r between the head and tail of the
    // observed sequence: all five pair sums are EXACT LONG arithmetic
    // over integer counts (the series is calendar-bounded), and the
    // closed form is one shared expression text both engines compile —
    // another classically-float statistic that hash-compares. Spark
    // side: per-series sorted collect of the bounded daily frame (the
    // ewma/holt discipline) + HOF folds — no window, no second
    // shuffle; the oracle spells the pairs with LEAD.
    QuerySpec.sql(
      "ts_autocorr1",
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |pairs AS (
         |  SELECT event_type, y AS a,
         |    LEAD(y) OVER (PARTITION BY event_type ORDER BY day) AS b
         |  FROM daily),
         |s AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS np,
         |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         |    CAST(SUM(a * b) AS BIGINT) AS sab,
         |    CAST(SUM(a * a) AS BIGINT) AS saa,
         |    CAST(SUM(b * b) AS BIGINT) AS sbb
         |  FROM pairs WHERE b IS NOT NULL GROUP BY 1)
         |SELECT event_type, np, ${AutoCorr.r} AS r1
         |FROM s ORDER BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy(col("event_type"))
        .agg(expr("transform(array_sort(collect_list(struct(day, y))), p -> p.y)")
          .as("ys"))
        .select(col("event_type"),
          expr("slice(ys, 1, size(ys) - 1)").as("a"),
          expr("slice(ys, 2, size(ys) - 1)").as("b"))
        .select(col("event_type"),
          expr("CAST(size(a) AS BIGINT)").as("np"),
          expr("aggregate(a, 0L, (acc, v) -> acc + v)").as("sa"),
          expr("aggregate(b, 0L, (acc, v) -> acc + v)").as("sb"),
          expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
            .as("sab"),
          expr("aggregate(a, 0L, (acc, v) -> acc + v * v)").as("saa"),
          expr("aggregate(b, 0L, (acc, v) -> acc + v * v)").as("sbb"))
        .filter(col("np") > 0)
        .select(col("event_type"), col("np"), expr(AutoCorr.r).as("r1"))
        .orderBy(col("event_type"))
    },

    // Full autocorrelation function at lags 1..7 per series — the
    // weekly-seasonality / memory-structure readout beside
    // ts_autocorr1's single lag-1 number (an ACF table is what a
    // forecasting pipeline inspects before picking AR terms). The
    // textbook estimator r_l = Σ(x_i−x̄)(x_{i+l}−x̄) / Σ(x_i−x̄)²
    // is kept EXACT by multiplying through by n²:
    //   num = n²·Σx_i·x_{i+l} − n·S·(Σa+Σb) + (n−l)·S²,
    //   den = n²·Q − n·S²,
    // both integers (S, Q the series sum / sum of squares), floored
    // to micro-units in DECIMAL(38,0) ≡ HUGEINT (negative lags
    // truncate toward zero identically in Spark `div` and DuckDB
    // `//`, the ts_theil_sen precedent). Plan: ONE daily rollup, the
    // per-series array collected once (calendar-bounded like the
    // ewma/holt folds), the 7 lags sliced from it — no per-lag
    // re-join, no window beyond the rollup.
    QuerySpec.sql(
      "ts_acf_lags",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS s,
        |    CAST(SUM(y * y) AS BIGINT) AS q
        |  FROM daily GROUP BY 1),
        |rn AS (
        |  SELECT event_type, y,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS i
        |  FROM daily),
        |lg AS (SELECT CAST(UNNEST(range(1, 8)) AS BIGINT) AS l),
        |pr AS (
        |  SELECT a.event_type, l.l, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(a.y * b.y) AS BIGINT) AS sab,
        |    CAST(SUM(a.y) AS BIGINT) AS sa,
        |    CAST(SUM(b.y) AS BIGINT) AS sb
        |  FROM rn a CROSS JOIN lg l
        |  JOIN rn b ON b.event_type = a.event_type AND b.i = a.i + l.l
        |  GROUP BY 1, 2)
        |SELECT p.event_type, p.l AS lag, p.cnt AS n_pairs,
        |  CAST(CASE WHEN st.n * st.q - st.s * st.s > 0 THEN
        |    (CAST(st.n AS HUGEINT) * st.n * p.sab
        |      - CAST(st.n AS HUGEINT) * st.s * (p.sa + p.sb)
        |      + CAST(p.cnt AS HUGEINT) * st.s * st.s) * 1000000
        |    // (CAST(st.n AS HUGEINT) * st.n * st.q
        |      - CAST(st.n AS HUGEINT) * st.s * st.s) END AS BIGINT)
        |    AS acf_micro
        |FROM pr p JOIN st USING (event_type)
        |ORDER BY event_type, lag""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy(col("event_type"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(day, y))), p -> p.y)")
          .as("ys"))
        .select(col("event_type"), col("ys"),
          expr("CAST(size(ys) AS BIGINT)").as("n"),
          expr("aggregate(ys, 0L, (acc, v) -> acc + v)").as("s"),
          expr("aggregate(ys, 0L, (acc, v) -> acc + v * v)").as("q"))
        .withColumn("l", explode(expr("sequence(1L, 7L)")))
        .filter(col("n") > col("l"))
        .select(col("event_type"), col("l").as("lag"),
          (col("n") - col("l")).as("cnt"), col("n"), col("s"), col("q"),
          expr("aggregate(zip_with(slice(ys, 1, CAST(n - l AS INT)), " +
            "slice(ys, CAST(l + 1 AS INT), CAST(n - l AS INT)), " +
            "(x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("sab"),
          expr("aggregate(slice(ys, 1, CAST(n - l AS INT)), 0L, " +
            "(acc, v) -> acc + v)").as("sa"),
          expr("aggregate(slice(ys, CAST(l + 1 AS INT), " +
            "CAST(n - l AS INT)), 0L, (acc, v) -> acc + v)").as("sb"))
        .select(col("event_type"), col("lag"),
          col("cnt").as("n_pairs"),
          expr("""CAST(CASE WHEN n * q - s * s > 0 THEN
            |  (CAST(n AS DECIMAL(38,0)) * n * sab
            |    - CAST(n AS DECIMAL(38,0)) * s * (sa + sb)
            |    + CAST(cnt AS DECIMAL(38,0)) * s * s) * 1000000
            |  div (CAST(n AS DECIMAL(38,0)) * n * q
            |    - CAST(n AS DECIMAL(38,0)) * s * s) END AS BIGINT)"""
            .stripMargin).as("acf_micro"))
        .orderBy(col("event_type"), col("lag"))
    },

    // Ljung–Box portmanteau per series — "is there ANY
    // autocorrelation in the first h lags?", the residual-whiteness
    // test a forecasting pipeline runs after fitting: Q_LB =
    // n(n+2)·Σ_{l≤h} r_l²/(n−l). Rides the exact ACF machinery
    // (num_l/den integer rationals, common den = n²Q − nS²): per-lag
    // t_l = num_l² // (n−l) (num² ≥ 0, so floor ≡ truncation in both
    // engines; error < 1 against ~10²² values), then ONE division
    // q_lb_micro = n(n+2)·10⁶·Σt_l // den² — all in DECIMAL(38,0) ≡
    // HUGEINT. Plan: the same one-collect-per-series array fold as
    // ts_acf_lags (calendar-bounded), a 7-lag explode, one re-group.
    QuerySpec.sql(
      "ts_ljung_box",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS s,
        |    CAST(SUM(y * y) AS BIGINT) AS q
        |  FROM daily GROUP BY 1),
        |rn AS (
        |  SELECT event_type, y,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS i
        |  FROM daily),
        |lg AS (SELECT CAST(UNNEST(range(1, 8)) AS BIGINT) AS l),
        |pr AS (
        |  SELECT a.event_type, l.l, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(a.y * b.y) AS BIGINT) AS sab,
        |    CAST(SUM(a.y) AS BIGINT) AS sa,
        |    CAST(SUM(b.y) AS BIGINT) AS sb
        |  FROM rn a CROSS JOIN lg l
        |  JOIN rn b ON b.event_type = a.event_type AND b.i = a.i + l.l
        |  GROUP BY 1, 2),
        |tl AS (
        |  SELECT p.event_type, st.n,
        |    CAST(st.n AS HUGEINT) * st.n * st.q
        |      - CAST(st.n AS HUGEINT) * st.s * st.s AS den,
        |    (CAST(st.n AS HUGEINT) * st.n * p.sab
        |      - CAST(st.n AS HUGEINT) * st.s * (p.sa + p.sb)
        |      + CAST(p.cnt AS HUGEINT) * st.s * st.s)
        |    * (CAST(st.n AS HUGEINT) * st.n * p.sab
        |      - CAST(st.n AS HUGEINT) * st.s * (p.sa + p.sb)
        |      + CAST(p.cnt AS HUGEINT) * st.s * st.s)
        |    // (st.n - p.l) AS t
        |  FROM pr p JOIN st USING (event_type))
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS h,
        |  CAST(CASE WHEN MAX(den) > 0 THEN
        |    CAST(MAX(n) AS HUGEINT) * (MAX(n) + 2) * 1000000 * SUM(t)
        |      // (MAX(den) * MAX(den)) END AS BIGINT) AS q_lb_micro
        |FROM tl GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy(col("event_type"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(day, y))), p -> p.y)")
          .as("ys"))
        .select(col("event_type"), col("ys"),
          expr("CAST(size(ys) AS BIGINT)").as("n"),
          expr("aggregate(ys, 0L, (acc, v) -> acc + v)").as("s"),
          expr("aggregate(ys, 0L, (acc, v) -> acc + v * v)").as("q"))
        .withColumn("l", explode(expr("sequence(1L, 7L)")))
        .filter(col("n") > col("l"))
        .select(col("event_type"), col("n"), col("l"),
          (col("n") - col("l")).as("cnt"), col("s"), col("q"),
          expr("aggregate(zip_with(slice(ys, 1, CAST(n - l AS INT)), " +
            "slice(ys, CAST(l + 1 AS INT), CAST(n - l AS INT)), " +
            "(x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("sab"),
          expr("aggregate(slice(ys, 1, CAST(n - l AS INT)), 0L, " +
            "(acc, v) -> acc + v)").as("sa"),
          expr("aggregate(slice(ys, CAST(l + 1 AS INT), " +
            "CAST(n - l AS INT)), 0L, (acc, v) -> acc + v)").as("sb"))
        .select(col("event_type"), col("n"),
          expr("CAST(n AS DECIMAL(38,0)) * n * q " +
            "- CAST(n AS DECIMAL(38,0)) * s * s").as("den"),
          expr("CAST(n AS DECIMAL(38,0)) * n * sab " +
            "- CAST(n AS DECIMAL(38,0)) * s * (sa + sb) " +
            "+ CAST(cnt AS DECIMAL(38,0)) * s * s").as("num"),
          (col("n") - col("l")).as("nl"))
        // floor of num²/(n−l) without the long-typed `div`: num² ≥ 0,
        // subtract-remainder keeps it an exact decimal integer
        .select(col("event_type"), col("n"), col("den"),
          expr("CAST((num * num - (num * num) % nl) / nl " +
            "AS DECIMAL(38,0))").as("t"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).cast("long").as("n"),
          count(lit(1)).cast("long").as("h"),
          max(col("den")).as("den"),
          sum(col("t"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .as("tsum"))
        .select(col("event_type"), col("n"), col("h"),
          expr("CAST(CASE WHEN den > 0 THEN " +
            "CAST(n AS DECIMAL(38,0)) * (n + 2) * 1000000 * tsum div " +
            "(den * den) END AS BIGINT)").as("q_lb_micro"))
        .orderBy(col("event_type"))
    },

    // Rescaled-range table (Hurst 1951 R/S analysis) per series: at
    // block sizes w ∈ {4, 8, 16}, each complete w-day block's range
    // of mean-adjusted cumulative deviations over its standard
    // deviation — the long-memory readout (slope of log R/S vs log w
    // ≈ the Hurst exponent; ~0.5 for the i.i.d. daily counts here).
    // Exactness: deviations are scaled ×w so the block mean never
    // floats (d_i = w·x_i − S, partial sums Y_j = w·cumsum − j·S),
    // and the square of the range is divided ONCE by the ×w²-scaled
    // variance (w·Q − S²) in DECIMAL(38,0) ≡ HUGEINT micro-units;
    // the per-(series, w) average of block ratios is an integer
    // division of integers. Plan: one daily rollup, a 3-row broadcast
    // w-grid, block-partitioned windows only — no global sort.
    QuerySpec.sql(
      "ts_hurst_rs",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |rn AS (
        |  SELECT event_type, y,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) AS i
        |  FROM daily),
        |ws AS (SELECT CAST(UNNEST([4, 8, 16]) AS BIGINT) AS w),
        |rows_ AS (
        |  SELECT r.event_type, w.w, (r.i - 1) // w.w AS b, r.i, r.y
        |  FROM rn r CROSS JOIN ws w),
        |bstat AS (
        |  SELECT event_type, w, b, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(y) AS BIGINT) AS s,
        |    CAST(SUM(y * y) AS BIGINT) AS q
        |  FROM rows_ GROUP BY 1, 2, 3),
        |cums AS (
        |  SELECT event_type, w, b, i,
        |    CAST(SUM(y) OVER (PARTITION BY event_type, w, b
        |      ORDER BY i) AS BIGINT) AS cy
        |  FROM rows_),
        |yv AS (
        |  SELECT c.event_type, c.w, c.b, bs.s, bs.q,
        |    c.w * c.cy - (c.i - c.b * c.w) * bs.s AS y_adj
        |  FROM cums c
        |  JOIN bstat bs ON bs.event_type = c.event_type
        |    AND bs.w = c.w AND bs.b = c.b AND bs.cnt = c.w),
        |rng AS (
        |  SELECT event_type, w, b, s, q,
        |    CAST(MAX(y_adj) - MIN(y_adj) AS BIGINT) AS rw
        |  FROM yv GROUP BY 1, 2, 3, 4, 5),
        |rs AS (
        |  SELECT event_type, w,
        |    CAST(CASE WHEN w * q - s * s > 0 THEN
        |      CAST(rw AS HUGEINT) * rw * 1000000
        |        // (CAST(w AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
        |      END AS BIGINT) AS rs2_ppm
        |  FROM rng)
        |SELECT event_type, w,
        |  CAST(COUNT(rs2_ppm) AS BIGINT) AS n_blocks,
        |  CAST(SUM(rs2_ppm) // COUNT(rs2_ppm) AS BIGINT)
        |    AS avg_rs2_ppm
        |FROM rs GROUP BY 1, 2
        |HAVING COUNT(rs2_ppm) > 0
        |ORDER BY event_type, w""".stripMargin) { (s, dir) =>
      import s.implicits._
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val rn = daily.withColumn("i",
        row_number().over(Window.partitionBy(col("event_type"))
          .orderBy(col("day"))).cast("long"))
      val rows = rn
        .crossJoin(broadcast(Seq(4L, 8L, 16L).toDF("w")))
        .withColumn("b", expr("(i - 1) div w"))
      val bstat = rows.groupBy(col("event_type"), col("w"), col("b"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).cast("long").as("s"),
          sum(col("y") * col("y")).cast("long").as("q"))
        .filter(col("cnt") === col("w"))
      val cums = rows.withColumn("cy",
        sum(col("y")).over(Window
          .partitionBy(col("event_type"), col("w"), col("b"))
          .orderBy(col("i"))).cast("long"))
      cums
        .join(bstat, Seq("event_type", "w", "b"))
        .withColumn("y_adj", expr("w * cy - (i - b * w) * s"))
        .groupBy(col("event_type"), col("w"), col("b"), col("s"),
          col("q"))
        .agg((max(col("y_adj")) - min(col("y_adj"))).cast("long")
          .as("rw"))
        .withColumn("rs2_ppm", expr(
          """CAST(CASE WHEN w * q - s * s > 0 THEN
            |  CAST(rw AS DECIMAL(38,0)) * rw * 1000000
            |    div (CAST(w AS DECIMAL(38,0)) * q
            |      - CAST(s AS DECIMAL(38,0)) * s)
            |END AS BIGINT)""".stripMargin))
        .groupBy(col("event_type"), col("w"))
        .agg(count(col("rs2_ppm")).as("n_blocks"),
          expr("CAST(sum(rs2_ppm) div count(rs2_ppm) AS BIGINT)")
            .as("avg_rs2_ppm"))
        .filter(col("n_blocks") > 0)
        .orderBy(col("event_type"), col("w"))
    },

    // CUSUM changepoint detection (Page 1954): per event-type series,
    // the two one-sided cumulative sums
    //   s⁺_i = max(0, s⁺_{i-1} + dev_i − K),
    //   s⁻_i = max(0, s⁻_{i-1} − dev_i − K)
    // flag sustained drift of the daily count away from the series
    // mean. Everything is scaled ×n (series length) so the mean never
    // becomes a float: dev_i = n·x_i − Σx is an exact integer that
    // sums to zero over the series, the slack K = Σx div 10 absorbs
    // one-day noise, and the alarm fires when a side exceeds
    // H = Σx div 10 (a tenth of a mean-day of scaled accumulated
    // drift — tight enough to flag the largest sustained excursions
    // of a stationary series, the regression surface this gate
    // pins). Same
    // per-series `aggregate` fold as ts_ewma/ts_holt_trend — one hash
    // aggregate + one explode, no window — with the textbook
    // recursive-CTE oracle.
    QuerySpec.sql(
      "ts_cusum",
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, day, n_events,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |      CAST(COUNT(*) AS BIGINT) AS n_events
        |    FROM events GROUP BY 1, 2) d),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_events) AS BIGINT) AS t,
        |    CAST(SUM(n_events) AS BIGINT) // 10 AS slack
        |  FROM daily GROUP BY 1),
        |r AS (
        |  SELECT d.event_type, d.rn, d.day, d.n_events,
        |    GREATEST(0, (s.n * d.n_events - s.t) - s.slack) AS s_pos,
        |    GREATEST(0, -(s.n * d.n_events - s.t) - s.slack) AS s_neg
        |  FROM daily d JOIN st s USING (event_type) WHERE d.rn = 1
        |  UNION ALL
        |  SELECT d.event_type, d.rn, d.day, d.n_events,
        |    GREATEST(0, r.s_pos + (s.n * d.n_events - s.t) - s.slack),
        |    GREATEST(0, r.s_neg - (s.n * d.n_events - s.t) - s.slack)
        |  FROM r JOIN daily d
        |    ON d.event_type = r.event_type AND d.rn = r.rn + 1
        |  JOIN st s ON s.event_type = d.event_type)
        |SELECT r.event_type, day, n_events,
        |  CAST(s_pos AS BIGINT) AS s_pos, CAST(s_neg AS BIGINT) AS s_neg,
        |  CASE WHEN s_pos > s.t // 10 OR s_neg > s.t // 10
        |    THEN 1 ELSE 0 END AS alarm
        |FROM r JOIN st s USING (event_type)
        |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("n_events"))))
          .as("arr"))
        .withColumn("arr", boundedArr("ts_cusum"))
        .withColumn("n", size(col("arr")).cast("long"))
        .withColumn("t", expr("aggregate(arr, 0L, (a, x) -> a + x.n_events)"))
        .withColumn("slack", expr("t div 10"))
        .select(col("event_type"), col("t"), explode(expr(
          """aggregate(arr,
            |  CAST(array() AS ARRAY<STRUCT<day: DATE, n_events: BIGINT,
            |    s_pos: BIGINT, s_neg: BIGINT>>),
            |  (acc, x) -> array_append(acc, named_struct(
            |    'day', x.day, 'n_events', x.n_events,
            |    's_pos', greatest(0L,
            |      CASE WHEN size(acc) = 0 THEN 0L
            |           ELSE element_at(acc, -1).s_pos END
            |        + (n * x.n_events - t) - slack),
            |    's_neg', greatest(0L,
            |      CASE WHEN size(acc) = 0 THEN 0L
            |           ELSE element_at(acc, -1).s_neg END
            |        - (n * x.n_events - t) - slack))))""".stripMargin))
          .as("e"))
        .select(col("event_type"), col("e.day").as("day"),
          col("e.n_events").as("n_events"), col("e.s_pos").as("s_pos"),
          col("e.s_neg").as("s_neg"),
          when(col("e.s_pos") > expr("t div 10") ||
              col("e.s_neg") > expr("t div 10"), 1)
            .otherwise(0).as("alarm"))
        .orderBy(col("event_type"), col("day"))
    },

    // Bidirectional nearest-event join: each event picks whichever of
    // the user's latest order at-or-before / earliest order at-or-after
    // is temporally CLOSER (ties to the earlier one) — composing the
    // two as-of scans in one relation, the "nearest reference row"
    // enrichment. Cost: the two merge-and-fill passes + one column
    // comparison; no range probe.
    QuerySpec.sql(
      "j_asof_nearest_order",
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate,
        |    CAST(MIN(o_orderkey) AS BIGINT) AS o_orderkey
        |  FROM orders GROUP BY 1, 2),
        |bwd AS (
        |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |    o.o_orderkey AS b_key, epoch_us(o.o_orderdate) AS b_us
        |  FROM events e ASOF LEFT JOIN ord o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts),
        |fwd AS (
        |  SELECT e.event_id, o.o_orderkey AS f_key,
        |    epoch_us(o.o_orderdate) AS f_us
        |  FROM events e ASOF LEFT JOIN ord o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts)
        |SELECT b.event_id, b.user_id, b.ts_us,
        |  CASE WHEN b.b_key IS NULL THEN f.f_key
        |       WHEN f.f_key IS NULL THEN b.b_key
        |       WHEN b.ts_us - b.b_us <= f.f_us - b.ts_us THEN b.b_key
        |       ELSE f.f_key END AS nearest_orderkey
        |FROM bwd b JOIN fwd f ON f.event_id = b.event_id
        |ORDER BY b.event_id""".stripMargin) { (s, dir) =>
      val ords = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(min(col("o_orderkey")).as("o_orderkey"))
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val bwd = graft.functions.AsOfJoin.asofBackward(ev, "user_id", "ts",
          ords.withColumn("b_us",
            unix_micros(col("o_orderdate").cast("timestamp"))),
          "o_custkey", "o_orderdate", Seq("o_orderkey", "b_us"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("o_orderkey").as("b_key"), col("b_us"))
      val fwd = graft.functions.AsOfJoin.asofForward(ev, "user_id", "ts",
          ords.withColumn("f_us",
            unix_micros(col("o_orderdate").cast("timestamp"))),
          "o_custkey", "o_orderdate", Seq("o_orderkey", "f_us"))
        .select(col("event_id").as("f_event_id"),
          col("o_orderkey").as("f_key"), col("f_us"))
      bwd.join(fwd, col("f_event_id") === col("event_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          when(col("b_key").isNull, col("f_key"))
            .when(col("f_key").isNull, col("b_key"))
            .when(col("ts_us") - col("b_us") <= col("f_us") - col("ts_us"),
              col("b_key"))
            .otherwise(col("f_key")).as("nearest_orderkey"))
        .orderBy(col("event_id"))
    },

    // As-of with a staleness tolerance: the backward match only counts
    // if it is at most 30 days old at probe time — the quote-expiry
    // variant every trading/feature system needs. Same merge plan as
    // j_asof_latest_order; the tolerance is a post-projection null-out,
    // not a join-shape change.
    QuerySpec.sql(
      "j_asof_tolerance",
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate,
        |    CAST(MAX(o_orderkey) AS BIGINT) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  CASE WHEN epoch_us(e.ts) - epoch_us(o.o_orderdate)
        |      <= 2592000000000 THEN o.o_orderkey END AS o_orderkey
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val tolUs = 2592000000000L // 30 days
      val ords = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .withColumn("o_us", unix_micros(col("o_orderdate").cast("timestamp")))
      graft.functions.AsOfJoin.asofBackward(
          events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
          "user_id", "ts",
          ords, "o_custkey", "o_orderdate",
          Seq("o_orderkey", "o_us"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          when(unix_micros(col("ts")) - col("o_us") <= tolUs,
            col("o_orderkey")).as("o_orderkey"))
        .orderBy(col("event_id"))
    },

    // Trailing 7-day rolling MEDIAN of daily counts per series — the
    // robust-baseline companion to the z-score gate (a single spike
    // day cannot drag the median the way it drags the mean). Exact
    // integers: emitted as 2·median (the sum of the two middle order
    // statistics) so the even-window halving never leaves the integer
    // domain. The per-row sort is over ≤ 7 values — constant work per
    // row, no cross-row state beyond the bounded frame.
    QuerySpec.sql(
      "ts_rolling_median",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n_events,
        |    list_sort(list(n_events) OVER w7) AS win
        |  FROM daily
        |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, n_events,
        |  CAST(win[(len(win) + 1) // 2] + win[len(win) // 2 + 1] AS BIGINT)
        |    AS med_x2
        |FROM w ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("win", sort_array(collect_list(col("n_events")).over(w7)))
        .select(col("event_type"), col("day"), col("n_events"),
          (element_at(col("win"), expr("(size(win) + 1) div 2").cast("int")) +
            element_at(col("win"), expr("size(win) div 2 + 1").cast("int")))
            .as("med_x2"))
        .orderBy(col("event_type"), col("day"))
    },

    // Z-order layout key: Morton-interleaved (user, hour-bucket) —
    // the one sort key that clusters BOTH per-user scans and
    // time-range scans for parquet row-group skipping
    // (functions/ZOrder.scala; `sortWithinPartitions(z)` at write
    // time). Pure integer bit math, verified bit-for-bit.
    QuerySpec.sql(
      "store_zorder_key", {
        val z = graft.functions.ZOrder.zValueSql(
          "user_id % 65536", "(epoch_us(ts) // 3600000000) % 65536")
        s"""SELECT event_id, user_id,
           |  CAST((epoch_us(ts) // 3600000000) % 65536 AS BIGINT)
           |    AS hour_bucket,
           |  CAST($z AS BIGINT) AS z_key
           |FROM events
           |ORDER BY event_id""".stripMargin
      }) { (s, dir) =>
      val hourBucket = pmod(expr("unix_micros(ts) div 3600000000"),
        lit(65536L))
      events(s, dir)
        .select(col("event_id"), col("user_id"),
          hourBucket.as("hour_bucket"),
          graft.functions.ZOrder.zValue(
            pmod(col("user_id"), lit(65536L)), hourBucket).as("z_key"))
        .orderBy(col("event_id"))
    },

    // Data-skipping effectiveness — WHY the z-order layout exists,
    // measured: rows are laid into fixed-size files under two sort
    // orders (Morton z-key vs insertion order), per-file min/max
    // user_id statistics are computed exactly as a parquet writer
    // would, and a point-user query's prune fraction is read off the
    // file stats — the skipping report a table-format OPTIMIZE job
    // prints. Each layout is one PrefixSum global rank (range
    // partition, no single-task sort) + a file-grain aggregate +
    // a 2-row fold; the z-order layout should prune strictly more
    // files than insertion order for the same predicate.
    QuerySpec.sql(
      "store_skipping_stats", {
        val z = graft.functions.ZOrder.zValueSql(
          "user_id % 65536", "(epoch_us(ts) // 3600000000) % 65536")
        s"""WITH base AS (
           |  SELECT event_id, user_id, CAST($z AS BIGINT) AS z_key
           |  FROM events),
           |rz AS (SELECT user_id,
           |    (ROW_NUMBER() OVER (ORDER BY z_key, event_id) - 1) // 512
           |      AS f
           |  FROM base),
           |ri AS (SELECT user_id,
           |    (ROW_NUMBER() OVER (ORDER BY event_id) - 1) // 512 AS f
           |  FROM base),
           |fz AS (SELECT f, MIN(user_id) AS mn, MAX(user_id) AS mx
           |  FROM rz GROUP BY 1),
           |fi AS (SELECT f, MIN(user_id) AS mn, MAX(user_id) AS mx
           |  FROM ri GROUP BY 1),
           |sz AS (SELECT 'zorder' AS layout,
           |    CAST(COUNT(*) AS BIGINT) AS n_files,
           |    CAST(COALESCE(SUM(CASE WHEN mn <= 7 AND mx >= 7
           |      THEN 1 END), 0) AS BIGINT) AS hit_files
           |  FROM fz),
           |si AS (SELECT 'insertion' AS layout,
           |    CAST(COUNT(*) AS BIGINT) AS n_files,
           |    CAST(COALESCE(SUM(CASE WHEN mn <= 7 AND mx >= 7
           |      THEN 1 END), 0) AS BIGINT) AS hit_files
           |  FROM fi)
           |SELECT layout, n_files, hit_files,
           |  CAST((n_files - hit_files) * 1000000 // n_files AS BIGINT)
           |    AS prune_ppm
           |FROM (SELECT * FROM sz UNION ALL SELECT * FROM si)
           |ORDER BY layout""".stripMargin
      }) { (s, dir) =>
      val hourBucket = pmod(expr("unix_micros(ts) div 3600000000"),
        lit(65536L))
      val base = events(s, dir)
        .select(col("event_id"), col("user_id"),
          graft.functions.ZOrder.zValue(
            pmod(col("user_id"), lit(65536L)), hourBucket).as("z_key"))
      def layoutStats(sortKeys: Seq[org.apache.spark.sql.Column],
          layout: String) =
        graft.functions.PrefixSum
          .globalCumsum(base, sortKeys, lit(1L), "rk")
          .select(col("user_id"), expr("(rk - 1) div 512").as("f"))
          .groupBy(col("f"))
          .agg(min(col("user_id")).as("mn"), max(col("user_id")).as("mx"))
          .agg(count(lit(1)).as("n_files"),
            coalesce(sum(when(col("mn") <= 7 && col("mx") >= 7, 1L)),
              lit(0L)).as("hit_files"))
          .select(lit(layout).as("layout"), col("n_files"),
            col("hit_files"),
            expr("CAST((n_files - hit_files) * 1000000 div n_files AS BIGINT)")
              .as("prune_ppm"))
      layoutStats(Seq(col("z_key"), col("event_id")), "zorder")
        .unionAll(layoutStats(Seq(col("event_id")), "insertion"))
        .orderBy(col("layout"))
    },

    // Hilbert layout key: the space-filling curve with NO seams — each
    // key increment is one unit step in (user, hour) space (proved
    // exhaustively in HilbertSpec), so contiguous key ranges are
    // compact blobs and per-file min/max stats stay tight. Codegen'd
    // native expression on the Spark side (the 8-round rotate/reflect
    // recurrence would triple a Column tree per round); the identical
    // integer recurrence runs as a CTE chain in the oracle.
    QuerySpec.sql(
      "store_hilbert_key", {
        val (ctes, fin) = graft.functions.Hilbert.hilbertCtes(
          "pre", Seq("event_id", "user_id", "hour_bucket"))
        s"""WITH pre AS (
           |  SELECT event_id, user_id,
           |    CAST((epoch_us(ts) // 3600000000) % 256 AS BIGINT)
           |      AS hour_bucket,
           |    user_id % 256 AS hx,
           |    (epoch_us(ts) // 3600000000) % 256 AS hy
           |  FROM events),
           |$ctes
           |SELECT event_id, user_id, hour_bucket,
           |  CAST(hd AS BIGINT) AS h_key
           |FROM $fin
           |ORDER BY event_id""".stripMargin
      }) { (s, dir) =>
      val hourBucket = pmod(expr("unix_micros(ts) div 3600000000"),
        lit(256L))
      events(s, dir)
        .select(col("event_id"), col("user_id"),
          hourBucket.as("hour_bucket"),
          graft.functions.Hilbert.hilbertKey(
            pmod(col("user_id"), lit(256L)), hourBucket).as("h_key"))
        .orderBy(col("event_id"))
    },

    // Hilbert vs Morton, head-to-head on the metric that matters:
    // same file size, same per-file min/max stats, same point-user
    // predicate — which layout prunes more files? Morton's quadrant
    // seams let a single file's user range span the grid; Hilbert's
    // unit-step curve keeps it local, so its prune_ppm should win.
    // Each layout is one range-partitioned PrefixSum rank (no
    // single-task sort) + a file-grain aggregate.
    QuerySpec.sql(
      "store_hilbert_skipping", {
        val z = graft.functions.ZOrder.zValueSql(
          "user_id % 256", "(epoch_us(ts) // 3600000000) % 256", bits = 8)
        val (ctes, fin) = graft.functions.Hilbert.hilbertCtes(
          "pre", Seq("event_id", "ub", "zk"))
        s"""WITH pre AS (
           |  SELECT event_id, user_id % 256 AS ub,
           |    CAST($z AS BIGINT) AS zk,
           |    user_id % 256 AS hx,
           |    (epoch_us(ts) // 3600000000) % 256 AS hy
           |  FROM events),
           |$ctes,
           |rh AS (SELECT ub,
           |    (ROW_NUMBER() OVER (ORDER BY hd, event_id) - 1) // 512
           |      AS f
           |  FROM $fin),
           |rz AS (SELECT ub,
           |    (ROW_NUMBER() OVER (ORDER BY zk, event_id) - 1) // 512
           |      AS f
           |  FROM $fin),
           |fh AS (SELECT f, MIN(ub) AS mn, MAX(ub) AS mx
           |  FROM rh GROUP BY 1),
           |fz AS (SELECT f, MIN(ub) AS mn, MAX(ub) AS mx
           |  FROM rz GROUP BY 1),
           |sh AS (SELECT 'hilbert' AS layout,
           |    CAST(COUNT(*) AS BIGINT) AS n_files,
           |    CAST(COALESCE(SUM(CASE WHEN mn <= 7 AND mx >= 7
           |      THEN 1 END), 0) AS BIGINT) AS hit_files
           |  FROM fh),
           |sz AS (SELECT 'morton' AS layout,
           |    CAST(COUNT(*) AS BIGINT) AS n_files,
           |    CAST(COALESCE(SUM(CASE WHEN mn <= 7 AND mx >= 7
           |      THEN 1 END), 0) AS BIGINT) AS hit_files
           |  FROM fz)
           |SELECT layout, n_files, hit_files,
           |  CAST((n_files - hit_files) * 1000000 // n_files AS BIGINT)
           |    AS prune_ppm
           |FROM (SELECT * FROM sh UNION ALL SELECT * FROM sz)
           |ORDER BY layout""".stripMargin
      }) { (s, dir) =>
      val hourBucket = pmod(expr("unix_micros(ts) div 3600000000"),
        lit(256L))
      val ub = pmod(col("user_id"), lit(256L))
      val base = events(s, dir)
        .select(col("event_id"), ub.as("ub"),
          graft.functions.Hilbert.hilbertKey(ub, hourBucket).as("hk"),
          graft.functions.ZOrder.zValue(ub, hourBucket, bits = 8)
            .as("zk"))
      def layoutStats(key: String, layout: String) =
        graft.functions.PrefixSum
          .globalCumsum(base, Seq(col(key), col("event_id")), lit(1L),
            "rk")
          .select(col("ub"), expr("(rk - 1) div 512").as("f"))
          .groupBy(col("f"))
          .agg(min(col("ub")).as("mn"), max(col("ub")).as("mx"))
          .agg(count(lit(1)).as("n_files"),
            coalesce(sum(when(col("mn") <= 7 && col("mx") >= 7, 1L)),
              lit(0L)).as("hit_files"))
          .select(lit(layout).as("layout"), col("n_files"),
            col("hit_files"),
            expr("CAST((n_files - hit_files) * 1000000 div n_files AS BIGINT)")
              .as("prune_ppm"))
      layoutStats("hk", "hilbert")
        .unionAll(layoutStats("zk", "morton"))
        .orderBy(col("layout"))
    },

    // Bloom-filter file index — the skipping tier min/max CANNOT
    // provide: files are laid in INGEST (time) order, the normal
    // streaming-append reality, so every file's user_id range spans
    // nearly the whole key domain and min/max prunes nothing for a
    // point-user probe. A 1008-bit per-file bloom (16 x 63-bit words,
    // one hash bit per key; 63 not 64 — bit 63 would overflow a
    // signed shift under checked arithmetic) answers membership
    // directly: bloom_hits collapses toward true_files while
    // minmax_hits stays ~n_files. The gate materializes only the
    // probe's word — the stored index would hold all 16 words; the
    // per-file result is identical. One PrefixSum rank + one integer
    // file-grain fold, hash-exact in both engines.
    QuerySpec.sql(
      "store_bloom_skipping",
      """WITH r AS (
        |  SELECT user_id,
        |    (ROW_NUMBER() OVER (ORDER BY event_id) - 1) // 512 AS f,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 1008 AS p
        |  FROM events),
        |q AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(7 AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 1008 AS qp),
        |fstat AS (
        |  SELECT f, MIN(user_id) AS mn, MAX(user_id) AS mx,
        |    COALESCE(bit_or(CASE WHEN r.p // 63 = q.qp // 63
        |      THEN CAST(1 AS BIGINT) << CAST(r.p % 63 AS INTEGER)
        |      END), 0) AS bloom_qw,
        |    CAST(MAX(CASE WHEN user_id = 7 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS has_probe
        |  FROM r, q GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(has_probe) AS BIGINT) AS true_files,
        |  CAST(COALESCE(SUM(CASE WHEN mn <= 7 AND mx >= 7
        |    THEN 1 END), 0) AS BIGINT) AS minmax_hits,
        |  CAST(COALESCE(SUM(CASE WHEN (bloom_qw
        |      & (CAST(1 AS BIGINT) << CAST(q.qp % 63 AS INTEGER)))
        |      <> 0 THEN 1 END), 0) AS BIGINT) AS bloom_hits
        |FROM fstat, q GROUP BY q.qp""".stripMargin) { (s, dir) =>
      val p = pmod(graft.functions.Md5Prefix
        .md5_prefix_long(col("user_id").cast("string")), lit(1008L))
      val qp = pmod(graft.functions.Md5Prefix
        .md5_prefix_long(lit("7")), lit(1008L))
      val qbit = call_function("shiftleft", lit(1L),
        pmod(qp, lit(63L)).cast("int"))
      val base = events(s, dir)
        .select(col("event_id"), col("user_id"), p.as("p"), qp.as("qp"))
      graft.functions.PrefixSum
        .globalCumsum(base, Seq(col("event_id")), lit(1L), "rk")
        .select(col("user_id"), expr("(rk - 1) div 512").as("f"),
          when(expr("p div 63") === expr("qp div 63"),
            call_function("shiftleft", lit(1L),
              pmod(col("p"), lit(63L)).cast("int"))).as("bit"))
        .groupBy(col("f"))
        .agg(min(col("user_id")).as("mn"), max(col("user_id")).as("mx"),
          coalesce(expr("bit_or(bit)"), lit(0L)).as("bloom_qw"),
          max(when(col("user_id") === 7, 1L).otherwise(0L))
            .as("has_probe"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("has_probe")).as("true_files"),
          coalesce(sum(when(col("mn") <= 7 && col("mx") >= 7, 1L)),
            lit(0L)).as("minmax_hits"),
          coalesce(sum(when(col("bloom_qw").bitwiseAND(qbit) =!= 0, 1L)),
            lit(0L)).as("bloom_hits"))
    },

    // Self-measuring Bloom false-positive rate — the calibration gate
    // for every bloom-backed decision in this engine (file skipping,
    // decontamination prefilter): per source, a 1008-bit / 2-hash
    // bloom over the source's document ids is probed with every OTHER
    // source's doc ids (true non-members by construction — the exact
    // set difference is the ground truth), and the MEASURED collision
    // rate sits beside the load-factor prediction (bits_set/m)² — both
    // exact integer ppm, so the sketch's error bar is itself oracle-
    // checked (the dedup_band_recall discipline). Member and probe
    // surfaces are value-domain-sized (sources × corpus ids); the
    // filter itself is 16 OR-folded 63-bit words (bit 63 would
    // overflow a signed shift).
    QuerySpec.sql(
      "sketch_bloom_fpr", {
        def h(salt: String) =
          s"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':$salt'), 1, 8)) AS BIGINT) % 1008"
        s"""WITH hh AS (
           |  SELECT doc_id, source, ${h("f1")} AS p1, ${h("f2")} AS p2
           |  FROM documents),
           |mc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_members
           |  FROM hh GROUP BY 1),
           |bits AS (
           |  SELECT source, p // 63 AS w,
           |    bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER))
           |      AS bw
           |  FROM (
           |    SELECT source, p1 AS p FROM hh
           |    UNION ALL
           |    SELECT source, p2 AS p FROM hh)
           |  GROUP BY 1, 2),
           |bs AS (
           |  SELECT source, CAST(SUM(bit_count(bw)) AS BIGINT)
           |    AS bits_set
           |  FROM bits GROUP BY 1),
           |probes AS (
           |  SELECT s.source, hh.doc_id, hh.p1, hh.p2
           |  FROM (SELECT DISTINCT source FROM documents) s
           |  JOIN hh ON hh.source <> s.source),
           |fp AS (
           |  SELECT p.source, CAST(COUNT(*) AS BIGINT) AS n_probes,
           |    CAST(COALESCE(SUM(CASE WHEN
           |      (b1.bw >> CAST(p.p1 % 63 AS INTEGER)) & 1 = 1 AND
           |      (b2.bw >> CAST(p.p2 % 63 AS INTEGER)) & 1 = 1
           |      THEN 1 END), 0) AS BIGINT) AS false_pos
           |  FROM probes p
           |  LEFT JOIN bits b1 ON b1.source = p.source
           |    AND b1.w = p.p1 // 63
           |  LEFT JOIN bits b2 ON b2.source = p.source
           |    AND b2.w = p.p2 // 63
           |  GROUP BY 1)
           |SELECT fp.source AS source, n_members, n_probes, false_pos,
           |  false_pos * 1000000 // n_probes AS fpr_ppm,
           |  bits_set,
           |  bits_set * bits_set * 1000000 // (1008 * 1008)
           |    AS predicted_fpr_ppm
           |FROM fp JOIN bs ON bs.source = fp.source
           |JOIN mc ON mc.source = fp.source
           |ORDER BY source""".stripMargin
      }) { (s, dir) =>
      import graft.functions.Md5Prefix
      def h(salt: String) = pmod(Md5Prefix.md5_prefix_long(
        concat(col("doc_id").cast("string"), lit(s":$salt"))), lit(1008L))
      val hh = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          h("f1").as("p1"), h("f2").as("p2"))
      val mc = hh.groupBy(col("source"))
        .agg(count(lit(1)).as("n_members"))
      val bits = hh.select(col("source"), col("p1").as("p"))
        .unionAll(hh.select(col("source"), col("p2").as("p")))
        .groupBy(col("source"), expr("p div 63").as("w"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT)," +
          " CAST(p % 63 AS INT)))").as("bw"))
      val bs = bits.groupBy(col("source"))
        .agg(sum(expr("bit_count(bw)")).cast("long").as("bits_set"))
      val probes = hh.select(col("source")).distinct()
        .join(hh.select(col("source").as("src_m"), col("doc_id"),
          col("p1"), col("p2")), col("src_m") =!= col("source"))
      val b1 = bits.select(col("source").as("source1"),
        col("w").as("w1"), col("bw").as("bw1"))
      val b2 = bits.select(col("source").as("source2"),
        col("w").as("w2"), col("bw").as("bw2"))
      val fp = probes
        .join(broadcast(b1),
          col("source") === col("source1") &&
            expr("p1 div 63") === col("w1"), "left")
        .join(broadcast(b2),
          col("source") === col("source2") &&
            expr("p2 div 63") === col("w2"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_probes"),
          coalesce(sum(when(
            expr("shiftright(bw1, CAST(p1 % 63 AS INT)) & 1 = 1 AND" +
              " shiftright(bw2, CAST(p2 % 63 AS INT)) & 1 = 1"), 1L)),
            lit(0L)).as("false_pos"))
      fp.join(bs, Seq("source")).join(broadcast(mc), Seq("source"))
        .select(col("source"), col("n_members"), col("n_probes"),
          col("false_pos"),
          expr("false_pos * 1000000 div n_probes").as("fpr_ppm"),
          col("bits_set"),
          expr("bits_set * bits_set * 1000000 div (1008 * 1008)")
            .as("predicted_fpr_ppm"))
        .orderBy(col("source"))
    },

    // Key-range overlap depth — the LSM-style storage-health metric
    // min/max skipping stats imply but never state: how many files'
    // [min,max] user_id ranges stack over the worst key (a point
    // lookup reads max_depth files; compaction exists to drive this
    // toward 1). Classic endpoint sweep made distributed: ±1 deltas at
    // interval ends, globally ordered by (position, delta) through the
    // range-partitioned PrefixSum — no single-task sort — and
    // max(cumsum) is the answer. avg_span_ppm (mean file span over the
    // key domain) is the companion number: ingest-ordered files sit
    // near 1e6 — every file spans everything — which is WHY the bloom
    // tier exists.
    QuerySpec.sql(
      "store_overlap_depth",
      """WITH r AS (
        |  SELECT user_id,
        |    (ROW_NUMBER() OVER (ORDER BY event_id) - 1) // 512 AS f
        |  FROM events),
        |fr AS (
        |  SELECT f, CAST(MIN(user_id) AS BIGINT) AS mn,
        |    CAST(MAX(user_id) AS BIGINT) AS mx
        |  FROM r GROUP BY 1),
        |dom AS (
        |  SELECT CAST(MIN(mn) AS BIGINT) AS lo,
        |    CAST(MAX(mx) AS BIGINT) AS hi FROM fr),
        |ep AS (
        |  SELECT mn AS pos, 1 AS delta, f FROM fr
        |  UNION ALL
        |  SELECT mx + 1, -1, f FROM fr),
        |sw AS (
        |  SELECT SUM(delta) OVER (ORDER BY pos, delta, f) AS depth
        |  FROM ep)
        |SELECT CAST((SELECT COUNT(*) FROM fr) AS BIGINT) AS n_files,
        |  CAST((SELECT MAX(depth) FROM sw) AS BIGINT) AS max_depth,
        |  CAST((SELECT SUM(mx - mn + 1) FROM fr) * 1000000
        |    // ((SELECT COUNT(*) FROM fr)
        |        * (SELECT hi - lo + 1 FROM dom)) AS BIGINT)
        |    AS avg_span_ppm""".stripMargin) { (s, dir) =>
      val fr = graft.functions.PrefixSum
        .globalCumsum(events(s, dir).select(col("event_id"),
          col("user_id")), Seq(col("event_id")), lit(1L), "rk")
        .select(col("user_id"), expr("(rk - 1) div 512").as("f"))
        .groupBy(col("f"))
        .agg(min(col("user_id")).cast("long").as("mn"),
          max(col("user_id")).cast("long").as("mx"))
      val ep = fr.select(col("mn").as("pos"), lit(1L).as("delta"), col("f"))
        .unionAll(fr.select((col("mx") + 1).as("pos"),
          lit(-1L).as("delta"), col("f")))
      val maxDepth = graft.functions.PrefixSum
        .globalCumsum(ep, Seq(col("pos"), col("delta"), col("f")),
          col("delta"), "depth")
        .agg(max(col("depth")).as("max_depth"))
      val stats = fr.agg(count(lit(1)).as("n_files"),
        sum(col("mx") - col("mn") + 1).as("span"),
        min(col("mn")).as("lo"), max(col("mx")).as("hi"))
      stats.crossJoin(broadcast(maxDepth))
        .select(col("n_files"), col("max_depth"),
          expr("CAST(span * 1000000 div (n_files * (hi - lo + 1))" +
            " AS BIGINT)").as("avg_span_ppm"))
    },

    // Compaction planning — the OPTIMIZE bin-packer: daily ingest
    // leaves one small fragment per (series, day); pack consecutive
    // fragments into ~5000-row output files by assigning each
    // fragment the bin of its EXCLUSIVE running size (a fragment that
    // crosses the boundary starts a new bin — no fragment is ever
    // split, like parquet rewrites). Per-series keyed window (ordered
    // by day, so compaction preserves time-locality for pruning) +
    // one bin-grain aggregate; the plan report is what the OPTIMIZE
    // job prints before rewriting.
    QuerySpec.sql(
      "store_compaction_bins",
      """WITH f AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS bytes
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bytes,
        |    SUM(bytes) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - bytes AS cb
        |  FROM f)
        |SELECT event_type, CAST(cb // 5000 AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_input_files,
        |  CAST(SUM(bytes) AS BIGINT) AS bin_bytes
        |FROM c GROUP BY 1, 2
        |ORDER BY event_type, bin""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("bytes"))
        .select(col("event_type"), col("bytes"),
          (sum(col("bytes")).over(w) - col("bytes")).as("cb"))
        .groupBy(col("event_type"),
          expr("cb div 5000").as("bin"))
        .agg(count(lit(1)).as("n_input_files"),
          sum(col("bytes")).as("bin_bytes"))
        .orderBy(col("event_type"), col("bin"))
    },

    // Reshape: long → wide pivot of daily counts (one column per
    // series) — the dashboard/feature-matrix layout. The pivot value
    // list is EXPLICIT, so Spark skips the values-discovery job and
    // plans one partial+final aggregate pair (each pivot cell is a
    // conditional count — map-side combinable, one shuffle on day).
    QuerySpec.sql(
      "pivot_event_daily", {
        val cols = Seq("click", "error", "purchase", "signup", "view")
          .map(t => s"""CAST(COALESCE(SUM(CASE WHEN event_type = '$t'
             |    THEN 1 END), 0) AS BIGINT) AS $t""".stripMargin)
          .mkString(",\n  ")
        s"""SELECT day,
           |  $cols
           |FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           |    event_type FROM events) e
           |GROUP BY day
           |ORDER BY day""".stripMargin
      }) { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("day") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("day"))
    },

    // W: RANGE frame over a GAPPY series — trailing 7 calendar days,
    // not 7 rows: on the sparse (value > 200) series the two frames
    // genuinely differ wherever days are missing, which is exactly
    // what a ROWS spelling silently gets wrong. Ordered by
    // days-since-epoch so the range offset is plain integer
    // arithmetic in both engines.
    QuerySpec.sql(
      "w9_range_frame",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dnum,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events WHERE value > 200 GROUP BY 1, 2, 3)
        |SELECT event_type, day, n_events,
        |  CAST(SUM(n_events) OVER w AS BIGINT) AS sum_7d,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS days_present_7d
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY dnum
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("dnum"))
        .rangeBetween(-6, 0)
      events(s, dir).filter(col("value") > 200)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("dnum", datediff(col("day"), lit("1970-01-01")).cast("long"))
        .select(col("event_type"), col("day"), col("n_events"),
          sum(col("n_events")).over(w).as("sum_7d"),
          count(lit(1)).over(w).as("days_present_7d"))
        .orderBy(col("event_type"), col("day"))
    },

    // Classical seasonal decomposition (the moving-average STL
    // ancestor): value = trend + weekly seasonal + residual, per
    // series. Trend = centered 7-calendar-day moving mean; seasonal =
    // per-day-of-week mean deviation from trend; residual = the rest.
    // Everything in integer micros — trend is an exact floored
    // rational of two window sums, deviations/seasonals/residuals are
    // exact longs (both engines truncate integer division toward
    // zero, verified) — so the full decomposition hash-compares.
    //
    // Scale shape: one daily aggregate (hash, map-side combinable),
    // one keyed calendar-RANGE window per series, one 7·|series|-group
    // hash aggregate broadcast back. Nothing unpartitioned.
    QuerySpec.sql(
      "ts_seasonal_decompose",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dnum,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2, 3),
        |trended AS (
        |  SELECT event_type, day, dnum, n_events,
        |    CAST((1000000 * CAST(SUM(n_events) OVER w AS BIGINT))
        |      // CAST(COUNT(*) OVER w AS BIGINT) AS BIGINT) AS trend_micros
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY dnum
        |    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dev AS (
        |  SELECT *, 1000000 * n_events - trend_micros AS dev_micros,
        |    dnum % 7 AS dow
        |  FROM trended),
        |seasonal AS (
        |  SELECT event_type, dow,
        |    CAST(CAST(SUM(dev_micros) AS BIGINT)
        |      // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS seasonal_micros
        |  FROM dev GROUP BY 1, 2)
        |SELECT d.event_type, d.day, d.n_events, d.trend_micros,
        |  s.seasonal_micros,
        |  d.dev_micros - s.seasonal_micros AS resid_micros
        |FROM dev d
        |JOIN seasonal s ON s.event_type = d.event_type AND s.dow = d.dow
        |ORDER BY d.event_type, d.day""".stripMargin) { (s, dir) =>
      decomposed(s, dir)
        .select(col("event_type"), col("day"), col("n_events"),
          col("trend_micros"), col("seasonal_micros"),
          (col("dev_micros") - col("seasonal_micros")).as("resid_micros"))
        .orderBy(col("event_type"), col("day"))
    },

    // Seasonal/trend STRENGTH — the one-number-per-series readout of
    // the decomposition above (Hyndman's F_s/F_t: 1 − Var(resid) over
    // Var(seasonal+resid) / Var(trend+resid)): which series actually
    // HAVE a weekly cycle worth modeling. All component columns are
    // the decomposition's exact integer micros; the power sums run in
    // HUGEINT/DECIMAL(38,0) (resid² sums pass 2⁶³), and the variance
    // ratio is the AutoCorr float contract over those exact sums.
    QuerySpec.sql(
      "ts_seasonal_strength",
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |    CAST(date_diff('day', DATE '1970-01-01',
         |      CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dnum,
         |    CAST(COUNT(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2, 3),
         |trended AS (
         |  SELECT event_type, day, dnum, n_events,
         |    CAST((1000000 * CAST(SUM(n_events) OVER w AS BIGINT))
         |      // CAST(COUNT(*) OVER w AS BIGINT) AS BIGINT) AS trend_micros
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY dnum
         |    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         |dev AS (
         |  SELECT *, 1000000 * n_events - trend_micros AS dev_micros,
         |    dnum % 7 AS dow
         |  FROM trended),
         |seasonal AS (
         |  SELECT event_type, dow,
         |    CAST(CAST(SUM(dev_micros) AS BIGINT)
         |      // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS seasonal_micros
         |  FROM dev GROUP BY 1, 2),
         |comp AS (
         |  SELECT d.event_type,
         |    d.dev_micros - s.seasonal_micros AS r,
         |    d.dev_micros AS sr,
         |    1000000 * d.n_events - s.seasonal_micros AS tr
         |  FROM dev d
         |  JOIN seasonal s ON s.event_type = d.event_type
         |    AND s.dow = d.dow),
         |a AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(r) AS BIGINT) AS s_r,
         |    CAST(SUM(CAST(r AS HUGEINT) * r) AS DOUBLE) AS q_r,
         |    CAST(SUM(sr) AS BIGINT) AS s_d,
         |    CAST(SUM(CAST(sr AS HUGEINT) * sr) AS DOUBLE) AS q_d,
         |    CAST(SUM(tr) AS BIGINT) AS s_t,
         |    CAST(SUM(CAST(tr AS HUGEINT) * tr) AS DOUBLE) AS q_t
         |  FROM comp GROUP BY 1)
         |SELECT event_type, n,
         |  ${Strength.expr("q_d", "s_d")} AS strength_seasonal,
         |  ${Strength.expr("q_t", "s_t")} AS strength_trend
         |FROM a ORDER BY event_type""".stripMargin) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val comp = decomposed(s, dir)
        .select(col("event_type"),
          (col("dev_micros") - col("seasonal_micros")).as("r"),
          col("dev_micros").as("sr"),
          (lit(1000000L) * col("n_events") - col("seasonal_micros"))
            .as("tr"))
      comp.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("r")).as("s_r"),
          sum(col("r").cast(d38) * col("r").cast(d38)).cast("double")
            .as("q_r"),
          sum(col("sr")).as("s_d"),
          sum(col("sr").cast(d38) * col("sr").cast(d38)).cast("double")
            .as("q_d"),
          sum(col("tr")).as("s_t"),
          sum(col("tr").cast(d38) * col("tr").cast(d38)).cast("double")
            .as("q_t"))
        .select(col("event_type"), col("n"),
          expr(Strength.expr("q_d", "s_d")).as("strength_seasonal"),
          expr(Strength.expr("q_t", "s_t")).as("strength_trend"))
        .orderBy(col("event_type"))
    },

    // Robust outlier flags via rolling MAD (median absolute
    // deviation): |x − med| > 3·MAD over the trailing 7-day window —
    // the robust companion to the z-score gate (one spike day cannot
    // inflate the MAD the way it inflates σ). Stays in integers by
    // scaling: med2 = 2·median (sum of middle order statistics),
    // dev2 = |2x − med2| = 2·|x − med|, mad4 = 2·median(dev2) =
    // 4·MAD, and the test becomes 2·dev2 > 3·mad4. Per-row work is
    // two 7-element sorts — constant, window-bounded.
    QuerySpec.sql(
      "ts_outlier_mad",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n_events,
        |    list_sort(list(n_events) OVER w7) AS win
        |  FROM daily
        |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT *, win[(len(win) + 1) // 2] + win[len(win) // 2 + 1]
        |    AS med2
        |  FROM w),
        |d AS (
        |  SELECT *, list_sort(list_transform(win,
        |    v -> abs(2 * v - med2))) AS devs
        |  FROM m)
        |SELECT event_type, day, n_events, CAST(med2 AS BIGINT) AS med2,
        |  CAST(devs[(len(devs) + 1) // 2] + devs[len(devs) // 2 + 1]
        |    AS BIGINT) AS mad4,
        |  len(win) >= 4 AND 2 * abs(2 * n_events - med2)
        |    > 3 * (devs[(len(devs) + 1) // 2] + devs[len(devs) // 2 + 1])
        |    AS is_outlier
        |FROM d ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("win", sort_array(collect_list(col("n_events")).over(w7)))
        .withColumn("med2",
          element_at(col("win"), expr("(size(win) + 1) div 2").cast("int")) +
            element_at(col("win"), expr("size(win) div 2 + 1").cast("int")))
        .withColumn("devs",
          sort_array(expr("transform(win, v -> abs(2L * v - med2))")))
        .withColumn("mad4",
          element_at(col("devs"), expr("(size(devs) + 1) div 2").cast("int")) +
            element_at(col("devs"), expr("size(devs) div 2 + 1").cast("int")))
        .select(col("event_type"), col("day"), col("n_events"),
          col("med2"), col("mad4"),
          (size(col("win")) >= 4 &&
            lit(2L) * abs(lit(2L) * col("n_events") - col("med2")) >
              lit(3L) * col("mad4")).as("is_outlier"))
        .orderBy(col("event_type"), col("day"))
    },

    // Forward as-of join: each event picks up the user's NEXT order
    // at-or-after the event time (conversion attribution: which
    // purchase followed this click). Same merge-and-fill machinery as
    // the backward gate, scanned time-descending — one key shuffle,
    // vs DuckDB's native forward ASOF (build time ≥ probe time).
    QuerySpec.sql(
      "j_asof_next_order",
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate,
        |    CAST(MIN(o_orderkey) AS BIGINT) AS o_orderkey,
        |    min_by(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  o.o_orderkey, o.o_totalprice
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ords = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(min(col("o_orderkey")).as("o_orderkey"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      graft.functions.AsOfJoin.asofForward(
          events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
          "user_id", "ts",
          ords, "o_custkey", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // Skewed as-of join through the SKEW-PROOF bucketed variant
    // ([[graft.functions.AsOfJoin.asofBackwardBucketed]]): half of all
    // probe and build rows collapse onto one hot key (user_id even →
    // key 0), the exact single-pathological-key shape that serializes
    // the plain per-key-window formulation into one task. The bucketed
    // plan range-partitions on (key, time) so the hot key spans many
    // partitions, fills locally, and stitches partition boundaries
    // with a broadcast carry — DuckDB's native ASOF LEFT JOIN verifies
    // the relation end-to-end (the skew path was previously
    // unit-tested only).
    QuerySpec.sql(
      "j_asof_skewed",
      """WITH ev AS (
        |  SELECT event_id,
        |    CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS k,
        |    ts FROM events),
        |ord AS (
        |  SELECT CASE WHEN o_custkey % 2 = 0 THEN 0 ELSE o_custkey END AS k,
        |    o_orderdate,
        |    CAST(MAX(o_orderkey) AS BIGINT) AS o_orderkey,
        |    max_by(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.k, epoch_us(e.ts) AS ts_us,
        |  o.o_orderkey, o.o_totalprice
        |FROM ev e ASOF LEFT JOIN ord o
        |  ON e.k = o.k AND o.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val hot = (c: org.apache.spark.sql.Column) =>
        when(c % 2 === 0, lit(0L)).otherwise(c)
      val ev = events(s, dir)
        .select(col("event_id"), hot(col("user_id")).as("k"), col("ts"))
      val ords = Tables(s, dir, "orders")
        .withColumn("k", hot(col("o_custkey")))
        .groupBy(col("k"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      graft.functions.AsOfJoin.asofBackwardBucketed(
          ev, "k", "ts", ords, "k", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("k"),
          unix_micros(col("ts")).as("ts_us"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // Interval-overlap join: user sessions x per-(series, day)
    // busy-hour windows ([first event of the day, +6 h]). The naive
    // form is an inequality theta-join (quadratic); here BOTH interval
    // sides explode into the 1-day time buckets they cover, the join
    // runs as a hash EQUI-join on the bucket key with the overlap
    // predicate as a residual filter, and each pair is emitted from
    // exactly one OWNING bucket (bag semantics — see IntervalJoin).
    // Bucket fan-out is bounded by interval length / bucket width
    // (sessions: 4 h idle cut keeps spans short; windows: exactly
    // 6 h), so the explode is O(rows), never O(rows x span).
    QuerySpec.sql(
      "j_interval_overlap",
      s"""WITH $sessionsSql,
         |win AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |    MIN(epoch_us(ts)) AS w_start,
         |    MIN(epoch_us(ts)) + 21600000000 AS w_end
         |  FROM events GROUP BY 1, 2)
         |SELECT s.user_id, s.sess, w.event_type, w.day,
         |  LEAST(s.end_us, w.w_end) - GREATEST(s.start_us, w.w_start)
         |    AS overlap_us
         |FROM sess s JOIN win w
         |  ON s.start_us <= w.w_end AND w.w_start <= s.end_us
         |ORDER BY s.user_id, s.sess, w.event_type, w.day""".stripMargin) { (s, dir) =>
      val sess = sessions(s, dir)
        .select(col("user_id"), col("sess"), col("start_us"), col("end_us"))
      val win = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(min(unix_micros(col("ts"))).as("w_start"))
        .withColumn("w_end", col("w_start") + lit(21600000000L))
      graft.functions.IntervalJoin
        .overlap(sess, win, "start_us", "end_us", "w_start", "w_end",
          bucketWidth = 86400000000L) // 1-day buckets
        .select(col("user_id"), col("sess"), col("event_type"), col("day"),
          (least(col("end_us"), col("w_end")) -
            greatest(col("start_us"), col("w_start"))).as("overlap_us"))
        .orderBy(col("user_id"), col("sess"), col("event_type"), col("day"))
    },

    // Per-user event-type transition matrix (first-order Markov): how
    // often does type A immediately precede type B in a user's
    // time-ordered stream, and with what conditional probability. One
    // user_id shuffle (the same partitioning sessionize rides), a
    // LEAD over the unique (ts, event_id) order, then a hash aggregate
    // over ≤ |types|² keys; the per-from normalization runs as a
    // window over that BOUNDED matrix, never over row-scale data.
    // n_trans is an exact long; p_trans is one long/long division —
    // identical IEEE result in both engines.
    QuerySpec.sql(
      "events_transitions",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |p AS (SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS to_type
        |  FROM e),
        |c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |  CAST(n_trans AS DOUBLE) /
        |    CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE)
        |    AS p_trans
        |FROM c ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val c = events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      c.withColumn("p_trans",
          col("n_trans").cast("double") /
            sum(col("n_trans")).over(Window.partitionBy(col("from_type")))
              .cast("double"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Trailing-7-day rolling distinct actives per calendar day — the
    // DAU/WAU overlay. Exact rolling COUNT DISTINCT without a range
    // self-join: the distinct (day, user) activity table (the ONLY
    // row-scale pass) explodes each activity day to the ≤ 7 target
    // days it covers, and a second distinct + count per target day
    // finishes the job — the IntervalJoin bucket-replication
    // discipline applied to a window query. Every shuffle key is a
    // calendar day; the fan-out is 7× a per-day-bounded table.
    QuerySpec.sql(
      "ts_rolling_actives",
      """WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
        |    AS day, user_id FROM events),
        |b AS (SELECT MAX(day) AS d1 FROM du),
        |r AS (SELECT c.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT)
        |    AS actives_7d
        |  FROM (SELECT DISTINCT day FROM
        |      (SELECT day + CAST(g AS INT) AS day FROM du,
        |        UNNEST(generate_series(0, 6)) AS t(g)) x, b
        |      WHERE x.day <= b.d1) c
        |    JOIN du u ON u.day BETWEEN c.day - 6 AND c.day
        |  GROUP BY 1),
        |o AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS actives_1d
        |  FROM du GROUP BY 1)
        |SELECT r.day, COALESCE(o.actives_1d, CAST(0 AS BIGINT))
        |    AS actives_1d, r.actives_7d
        |FROM r LEFT JOIN o ON o.day = r.day ORDER BY r.day""".stripMargin) {
      (s, dir) =>
      val du = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      val bounds = du.agg(max(col("day")).as("d1"))
      val r7 = du
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("day"))
        .join(broadcast(bounds), col("day") <= col("d1"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("actives_7d"))
      val o1 = du.groupBy(col("day")).agg(count(lit(1)).as("actives_1d"))
      r7.join(o1, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("actives_1d"), lit(0L)).as("actives_1d"),
          col("actives_7d"))
        .orderBy(col("day"))
    },

    // Conversion-latency profile: for users whose first signup is
    // later followed by a purchase, the time from that signup to the
    // FIRST qualifying purchase, profiled per signup day. The funnel
    // gate answers "did they convert"; this one answers "how fast".
    // Two hash aggregates around one user_id equi-join (the time
    // predicate is a residual, exactly the funnel plan); latencies
    // stay exact long micros, and the mean is a single shared-text
    // division over exact operands.
    QuerySpec.sql(
      "ts_time_to_convert",
      """WITH s AS (SELECT user_id, MIN(ts) AS s_ts,
        |    MIN(epoch_us(ts)) AS s_us
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT s.user_id, CAST(s.s_ts AS DATE) AS signup_day,
        |    MIN(p.us) - s.s_us AS lat_us
        |  FROM s JOIN (SELECT user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'purchase') p
        |    ON p.user_id = s.user_id AND p.us > s.s_us
        |  GROUP BY 1, 2, s.s_us)
        |SELECT signup_day, CAST(COUNT(*) AS BIGINT) AS n_converted,
        |  CAST(MIN(lat_us) AS BIGINT) AS min_lat_us,
        |  CAST(MAX(lat_us) AS BIGINT) AS max_lat_us,
        |  CAST(SUM(lat_us) AS DOUBLE) /
        |    (CAST(COUNT(*) AS DOUBLE) * 3600000000.0) AS avg_lat_hours
        |FROM c GROUP BY 1 ORDER BY signup_day""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("s_ts"), min(unix_micros(col("ts"))).as("s_us"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("us"))
      s0.join(pur, col("p_user") === col("user_id") && col("us") > col("s_us"))
        .groupBy(col("user_id"), to_date(col("s_ts")).as("signup_day"),
          col("s_us"))
        .agg((min(col("us")) - col("s_us")).as("lat_us"))
        .groupBy(col("signup_day"))
        .agg(count(lit(1)).cast("long").as("n_converted"),
          min(col("lat_us")).cast("long").as("min_lat_us"),
          max(col("lat_us")).cast("long").as("max_lat_us"),
          sum(col("lat_us")).cast("long").as("slat"))
        .withColumn("avg_lat_hours",
          col("slat").cast("double") /
            (col("n_converted").cast("double") * lit(3600000000.0)))
        .drop("slat")
        .orderBy(col("signup_day"))
    },

    // Lead-lag cross-correlation: Pearson r between the click and
    // purchase daily-count series at lags 0–3 days ("do clicks lead
    // purchases, and by how much") — the attribution diagnostic next
    // to ts_autocorr1. Both series densify over the shared global
    // calendar (gap days count 0, so a lag never silently skips a
    // hole), the 4 lag offsets explode from a literal array, and all
    // five pair sums per lag are EXACT LONG arithmetic folded in one
    // hash aggregate over ≤ 4 keys; the closed form is the shared
    // AutoCorr expression text. Row-scale work: one daily-count
    // aggregate; everything after is calendar-bounded metadata.
    QuerySpec.sql(
      "ts_xcorr_lag",
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS y
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1, 2),
         |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
         |cal AS (SELECT CAST(g AS DATE) AS day
         |  FROM b, UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
         |    AS t(g)),
         |a AS (SELECT c.day, COALESCE(d.y, 0) AS y FROM cal c
         |  LEFT JOIN daily d ON d.day = c.day AND d.event_type = 'click'),
         |p AS (SELECT c.day, COALESCE(d.y, 0) AS y FROM cal c
         |  LEFT JOIN daily d ON d.day = c.day AND d.event_type = 'purchase'),
         |pr AS (SELECT l.lag, a.y AS ya, p.y AS yp
         |  FROM a JOIN (SELECT UNNEST([0, 1, 2, 3]) AS lag) l ON TRUE
         |  JOIN p ON p.day = a.day + CAST(l.lag AS INT)),
         |st AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS np,
         |    CAST(SUM(ya) AS BIGINT) AS sa, CAST(SUM(yp) AS BIGINT) AS sb,
         |    CAST(SUM(ya * yp) AS BIGINT) AS sab,
         |    CAST(SUM(ya * ya) AS BIGINT) AS saa,
         |    CAST(SUM(yp * yp) AS BIGINT) AS sbb
         |  FROM pr GROUP BY 1)
         |SELECT CAST(lag AS BIGINT) AS lag, np, ${AutoCorr.r} AS r
         |FROM st ORDER BY lag""".stripMargin) { (s, dir) =>
      val daily = events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val cal = bounds
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      def dense(t: String): DataFrame = cal
        .join(daily.filter(col("event_type") === t), Seq("day"), "left")
        .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
      val a = dense("click").select(col("day"), col("y").as("ya"))
      val p = dense("purchase")
        .select(col("day").as("p_day"), col("y").as("yp"))
      a.select(col("day"), col("ya"),
          explode(lit(Array(0, 1, 2, 3))).as("lag"))
        .join(p, col("p_day") === date_add(col("day"), col("lag")))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("np"),
          sum(col("ya")).cast("long").as("sa"),
          sum(col("yp")).cast("long").as("sb"),
          sum(col("ya") * col("yp")).cast("long").as("sab"),
          sum(col("ya") * col("ya")).cast("long").as("saa"),
          sum(col("yp") * col("yp")).cast("long").as("sbb"))
        .select(col("lag").cast("long").as("lag"), col("np"),
          expr(AutoCorr.r).as("r"))
        .orderBy(col("lag"))
    },

    // Journey path mining: each (user, day)'s time-ordered event-type
    // sequence folded into one path string, then the corpus-wide
    // top-20 most common journeys — the sequence-mining read behind
    // funnel design. One hash aggregate to (user, day) with a
    // per-group bounded sorted fold (daily activity per user — never
    // corpus-scale state), one count aggregate over the distinct
    // paths, and a TakeOrderedAndProject top-20 (no global sort).
    QuerySpec.sql(
      "events_daily_paths",
      """SELECT path, CAST(COUNT(*) AS BIGINT) AS n_user_days FROM (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id)
        |      AS path
        |  FROM events GROUP BY 1, 2) p
        |GROUP BY 1 ORDER BY n_user_days DESC, path
        |LIMIT 20""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(expr(
          """concat_ws('>', transform(
            |  array_sort(collect_list(struct(
            |    unix_micros(ts) AS us, event_id, event_type))),
            |  x -> x.event_type))""".stripMargin).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_user_days"))
        .orderBy(col("n_user_days").desc, col("path"))
        .limit(20)
    },

    // Ordered three-step funnel (signup → click → purchase, strictly
    // in sequence): step N must happen AFTER the user's first step
    // N−1 event — the multi-step generalization of
    // funnel_signup_purchase, where a purchase before the first
    // post-signup click does NOT count. Three chained per-user MIN
    // aggregates around user_id equi-joins (time predicates as
    // residuals — the funnel plan); every shuffle shares the one
    // uniform user_id key, and all step times stay exact long micros.
    QuerySpec.sql(
      "funnel_three_step",
      """WITH s AS (SELECT user_id, MIN(ts) AS s_ts,
        |    MIN(epoch_us(ts)) AS s_us
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT s.user_id, MIN(e.us) AS c_us
        |  FROM s JOIN (SELECT user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'click') e
        |    ON e.user_id = s.user_id AND e.us > s.s_us
        |  GROUP BY 1),
        |p AS (SELECT c.user_id, MIN(e.us) AS p_us
        |  FROM c JOIN (SELECT user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'purchase') e
        |    ON e.user_id = c.user_id AND e.us > c.c_us
        |  GROUP BY 1)
        |SELECT CAST(s.s_ts AS DATE) AS signup_day,
        |  CAST(COUNT(*) AS BIGINT) AS n_signups,
        |  CAST(COUNT(c.c_us) AS BIGINT) AS n_clicked,
        |  CAST(COUNT(p.p_us) AS BIGINT) AS n_purchased
        |FROM s LEFT JOIN c ON c.user_id = s.user_id
        |LEFT JOIN p ON p.user_id = s.user_id
        |GROUP BY 1 ORDER BY signup_day""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      def typed(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id").as("e_user"), unix_micros(col("ts")).as("us"))
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("s_ts"), min(unix_micros(col("ts"))).as("s_us"))
      val c0 = s0
        .join(typed("click"),
          col("e_user") === col("user_id") && col("us") > col("s_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
      val p0 = c0
        .join(typed("purchase"),
          col("e_user") === col("user_id") && col("us") > col("c_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
      s0.join(c0, Seq("user_id"), "left")
        .join(p0, Seq("user_id"), "left")
        .groupBy(to_date(col("s_ts")).as("signup_day"))
        .agg(count(lit(1)).cast("long").as("n_signups"),
          count(col("c_us")).cast("long").as("n_clicked"),
          count(col("p_us")).cast("long").as("n_purchased"))
        .orderBy(col("signup_day"))
    },

    // One-way ANOVA — the k-group generalization of the two-sample
    // tests (Welch/z/U answer "do these TWO differ"; ANOVA answers
    // "does the metric differ across ALL event types at once").
    // EXACT-INTEGER form (round-12 rewrite: the previous spelling
    // summed k DOUBLES over the group table — Σs, Σs²/n — whose
    // partition-merge order is nondeterministic, and it finally flaked
    // at the 13th digit): cents-quantized values, per-group BIGINT /
    // DECIMAL(38,0) power sums, and the between/within sums of squares
    // as the same per-group Cauchy-Schwarz-nonnegative floors the
    // Brown-Forsythe gate uses — A = Σ(nt·S_g − n_g·St)²//n_g,
    // B = Σ(n_g·Q_g − S_g²)//n_g, F_micro = (nt−k)·A·10⁶ //
    // ((k−1)·nt²·B). The α=0.05 verdict (F₄,∞ crit 2.3719) compares
    // the exact micro integer. Headroom: (nt·S_g)² ≲ 4·10²⁸ at sf0.1
    // in DECIMAL(38,0) ≡ HUGEINT; the ×10⁶ product stays < 10³⁸ to
    // nt ~ 10⁶ rows.
    QuerySpec.sql(
      "stats_anova_f",
      """WITH v AS (
        |  SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS m
        |  FROM events),
        |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(m) AS BIGINT) AS s,
        |    CAST(SUM(CAST(m AS HUGEINT) * m) AS HUGEINT) AS q
        |  FROM v GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |  CAST(SUM(n) AS BIGINT) AS nt,
        |  CAST(SUM(s) AS BIGINT) AS st FROM g),
        |ab AS (SELECT
        |    CAST(SUM((CAST(tot.nt AS HUGEINT) * g.s - g.n * tot.st)
        |      * (CAST(tot.nt AS HUGEINT) * g.s - g.n * tot.st)
        |      // g.n) AS HUGEINT) AS a_num,
        |    CAST(SUM((g.n * g.q - CAST(g.s AS HUGEINT) * g.s)
        |      // g.n) AS HUGEINT) AS b_num
        |  FROM g, tot)
        |SELECT tot.k, tot.nt AS n,
        |  CAST(a_num // (CAST(tot.nt AS HUGEINT) * tot.nt) AS BIGINT)
        |    AS ss_between_c2,
        |  CAST(b_num AS BIGINT) AS ss_within_c2,
        |  CAST(CASE WHEN b_num > 0 AND tot.k > 1 THEN
        |    (tot.nt - tot.k) * a_num * 1000000
        |      // ((tot.k - 1) * CAST(tot.nt AS HUGEINT) * tot.nt
        |        * b_num) END AS BIGINT) AS f_micro,
        |  CASE WHEN b_num > 0 AND tot.k > 1 THEN
        |    (tot.nt - tot.k) * a_num * 1000000
        |      // ((tot.k - 1) * CAST(tot.nt AS HUGEINT) * tot.nt
        |        * b_num) > 2371900 END AS significant
        |FROM tot, ab""".stripMargin) { (s, dir) =>
      val D = org.apache.spark.sql.types.DecimalType(38, 0)
      val g = Materialize.stable(events(s, dir)
        .select(col("event_type").as("grp"),
          expr("CAST(round(value * 100) AS BIGINT)").as("m"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("m")).cast("long").as("s"),
          sum(expr("CAST(m AS DECIMAL(38,0)) * m")).cast(D).as("q")))
      val tot = g.agg(count(lit(1)).cast("long").as("k"),
        sum(col("n")).cast("long").as("nt"),
        sum(col("s")).cast("long").as("st"))
      val ab = g.crossJoin(broadcast(tot))
        .select(
          expr("CAST(nt AS DECIMAL(38,0)) * s - n * st").as("x"),
          expr("n * q - CAST(s AS DECIMAL(38,0)) * s").as("y"),
          col("n"))
        .select(expr("x * x").as("t"), col("y"), col("n"))
        // per-group floors via the exact subtract-remainder form
        // (Spark's integral div is long-typed; quotients can pass it)
        .select(
          expr("CAST((t - t % n) / n AS DECIMAL(38,0))").as("a_g"),
          expr("CAST((y - y % n) / n AS DECIMAL(38,0))").as("b_g"))
        .agg(sum(col("a_g")).cast(D).as("a_num"),
          sum(col("b_g")).cast(D).as("b_num"))
      tot.crossJoin(broadcast(ab))
        .select(col("k"), col("nt").as("n"),
          expr("CAST(a_num div (CAST(nt AS DECIMAL(38,0)) * nt) " +
            "AS BIGINT)").as("ss_between_c2"),
          expr("CAST(b_num AS BIGINT)").as("ss_within_c2"),
          expr("CAST(CASE WHEN b_num > 0 AND k > 1 THEN " +
            "CAST((nt - k) AS DECIMAL(38,0)) * a_num * 1000000 div " +
            "((k - 1) * CAST(nt AS DECIMAL(38,0)) * nt * b_num) " +
            "END AS BIGINT)").as("f_micro"),
          expr("CASE WHEN b_num > 0 AND k > 1 THEN " +
            "CAST(CAST((nt - k) AS DECIMAL(38,0)) * a_num * 1000000 " +
            "div ((k - 1) * CAST(nt AS DECIMAL(38,0)) * nt * b_num) " +
            "AS BIGINT) > 2371900 END").as("significant"))
    },

    // Tukey HSD post-hoc — the pairwise follow-up a significant ANOVA
    // demands (which GROUPS differ, with the familywise error rate
    // controlled; the parametric sibling of stats_dunn_posthoc). Per
    // pair: the mean difference as the exact rational
    // |s_a·n_b − s_b·n_a|/(n_a·n_b), and the studentized range
    // q = diff / sqrt(MSW·(n_a+n_b)/(2·df_w·n_a·n_b)) as ONE
    // shared-text IEEE chain over int64 inputs only (the within
    // sum-of-squares folds per group through the same exact
    // (n·q − s²)//n floor as stats_anova_f, summed to an int64 b_num
    // — BIGINT-safe while Σ(n_i−1)·s_i² cents² stays under 2⁶³,
    // i.e. to ~10¹⁰ rows at this value scale; past the envelope BOTH
    // engines fail loudly — Spark via a bartlett-style raise_error
    // on the per-group quotient, DuckDB via its HUGEINT→BIGINT cast
    // — never silently). The 5% verdict
    // compares the identical double against the fixed studentized-
    // range literal 3.858 (k = 5, df → ∞ — df_w is ~10⁵ here, where
    // the ∞ row is exact to the quoted precision). Plan: one events
    // fold + a k-row broadcast self-join (k = 5 → 10 pair rows).
    QuerySpec.sql(
      "stats_tukey_hsd", {
        val q = "(CAST(ABS(a_s * b_n - b_s * a_n) AS DOUBLE)" +
          " / (CAST(a_n AS DOUBLE) * CAST(b_n AS DOUBLE)))" +
          " / sqrt(CAST(b_num AS DOUBLE) * CAST(a_n + b_n AS DOUBLE)" +
          " / (2 * CAST(nt - k AS DOUBLE)" +
          " * CAST(a_n AS DOUBLE) * CAST(b_n AS DOUBLE)))"
        s"""WITH v AS (
           |  SELECT event_type AS grp,
           |    CAST(round(value * 100) AS BIGINT) AS m
           |  FROM events),
           |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(m) AS BIGINT) AS s,
           |    CAST(SUM(CAST(m AS HUGEINT) * m) AS HUGEINT) AS q
           |  FROM v GROUP BY 1 HAVING COUNT(*) >= 2),
           |w AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
           |    CAST(COUNT(*) AS BIGINT) AS k,
           |    CAST(SUM((n * q - CAST(s AS HUGEINT) * s) // n)
           |      AS BIGINT) AS b_num
           |  FROM g),
           |p AS (SELECT a.grp AS type_a, b.grp AS type_b,
           |    a.n AS a_n, b.n AS b_n, a.s AS a_s, b.s AS b_s,
           |    w.nt AS nt, w.k AS k, w.b_num AS b_num
           |  FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN w)
           |SELECT type_a, type_b, a_n AS n_a, b_n AS n_b,
           |  CAST(ABS(a_s * b_n - b_s * a_n) AS BIGINT) AS diff_x,
           |  CASE WHEN b_num > 0 AND nt > k THEN $q END AS q_stat,
           |  CASE WHEN b_num > 0 AND nt > k THEN $q >= 3.858 END
           |    AS significant
           |FROM p ORDER BY type_a, type_b""".stripMargin
      }) { (s, dir) =>
      val q = "(CAST(ABS(a_s * b_n - b_s * a_n) AS DOUBLE)" +
        " / (CAST(a_n AS DOUBLE) * CAST(b_n AS DOUBLE)))" +
        " / sqrt(CAST(b_num AS DOUBLE) * CAST(a_n + b_n AS DOUBLE)" +
        " / (2 * CAST(nt - k AS DOUBLE)" +
        " * CAST(a_n AS DOUBLE) * CAST(b_n AS DOUBLE)))"
      val g = Materialize.stable(events(s, dir)
        .select(col("event_type").as("grp"),
          expr("CAST(round(value * 100) AS BIGINT)").as("m"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("m")).cast("long").as("s"),
          sum(expr("CAST(m AS DECIMAL(38,0)) * m"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .as("q"))
        .filter(col("n") >= 2))
      // The per-group DECIMAL(38,0) div n yields LONG — and Spark's
      // decimal div WRAPS that quotient past 2⁶³ (silent wrong value)
      // while the DuckDB oracle errors loudly on its HUGEINT→BIGINT
      // cast. The pre-div envelope guard makes the failure symmetric:
      // loud in both engines past the 10¹⁸ per-group envelope (k = 5
      // groups ⇒ Σ ≤ 5·10¹⁸ < 2⁶³, so b_num itself stays BIGINT-safe
      // whenever every group passes).
      val w = g
        .withColumn("num",
          expr("n * q - CAST(s AS DECIMAL(38,0)) * s")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        // Envelope check on num BEFORE the div (r16): under ANSI (on
        // by default, probed) the decimal multiply throws on its own,
        // so the old `div ... IS NULL` arm was dead — and the old
        // `div ... > 1e18` arm was unsound, because Spark's decimal
        // div WRAPS its long quotient past 2⁶³ (probed: 10³⁸ div 1
        // returns a wrapped positive), so a wrap landing under 1e18
        // passed a wrong value silently. Bounding num ≤ n·10¹⁸ as a
        // pure decimal compare (no overflow, no wrap) enforces the
        // same quotient envelope totally; num ≥ 0 by Cauchy–Schwarz.
        .withColumn("q_g", expr(
          """CASE WHEN num >
            |    CAST(n AS DECIMAL(38,0)) * 1000000000000000000
            |  THEN raise_error(concat('stats_tukey_hsd: variance ',
            |    'numerator div n exceeds the int64 envelope; ',
            |    'coarsen the cents quantization'))
            |  ELSE num div n END""".stripMargin))
        .agg(sum(col("n")).cast("long").as("nt"),
          count(lit(1)).cast("long").as("k"),
          sum(col("q_g")).cast("long").as("b_num"))
      val a = g.select(col("grp").as("type_a"), col("n").as("a_n"),
        col("s").as("a_s"))
      val b = g.select(col("grp").as("type_b"), col("n").as("b_n"),
        col("s").as("b_s"))
      a.join(broadcast(b), col("type_a") < col("type_b"))
        .crossJoin(broadcast(w))
        .select(col("type_a"), col("type_b"),
          col("a_n").as("n_a"), col("b_n").as("n_b"),
          expr("CAST(ABS(a_s * b_n - b_s * a_n) AS BIGINT)")
            .as("diff_x"),
          expr(s"CASE WHEN b_num > 0 AND nt > k THEN $q END")
            .as("q_stat"),
          expr(s"CASE WHEN b_num > 0 AND nt > k THEN $q >= 3.858 END")
            .as("significant"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // Dynamic time warping between the event-type daily-count series
    // — the sequence-ALIGNMENT distance beside ts_xcorr_lag's fixed
    // lags (xcorr slides the whole series; DTW lets the alignment
    // stretch locally, the standard time-series similarity primitive
    // this engine otherwise lacks). Exact integer DP over |a_i − b_j|
    // cents... counts: no float anywhere. The recurrence's within-row
    // scan dependency (dp[i][j] needs dp[i][j−1]) is ELIMINATED by
    // the min-plus unroll dp[i][j] = C[j] + min_{k≤j}(min(prev[k],
    // prev[k−1]) − C[k−1]) (C = the cost row's prefix sums — the path
    // enters row i at k and only moves right), so both engines
    // express the whole DP with MAP-ONLY higher-order functions:
    // Spark aggregate/transform, DuckDB list_reduce/list_transform —
    // no recursive CTE, no UDF. Scale shape: each pair's DP is one
    // projection over two calendar-bounded arrays (≤ 31 days — the
    // frame is metadata, never row-scale); pairs are embarrassingly
    // parallel, and a Sakoe–Chiba band is the constant change
    // (restrict the k-slice) if the frame ever grows.
    QuerySpec.sql(
      "ts_dtw_pairs",
      s"""WITH d AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE)
         |    AS day, CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |s AS (SELECT event_type, list(x ORDER BY day) AS xs
         |  FROM d GROUP BY 1)
         |SELECT a.event_type AS type_a, b.event_type AS type_b,
         |  CAST(len(a.xs) AS BIGINT) AS n_a,
         |  CAST(len(b.xs) AS BIGINT) AS n_b,
         |  CAST(list_reduce(
         |    list_transform(generate_series(1, len(a.xs)), i ->
         |      CASE WHEN i = 1 THEN
         |        list_transform(generate_series(1, len(b.xs)), j ->
         |          CAST(list_sum(list_transform(generate_series(1, j),
         |            t -> abs(a.xs[1] - b.xs[t]))) AS BIGINT))
         |      ELSE
         |        list_transform(generate_series(1, len(b.xs)), j ->
         |          CAST(abs(a.xs[i] - b.xs[j]) AS BIGINT)) END),
         |    (acc, x) -> list_transform(
         |      generate_series(1, len(x)), j ->
         |        CAST(list_sum(list_slice(x, 1, j)) AS BIGINT)
         |        + list_min(list_transform(generate_series(1, j),
         |          k -> least(acc[k],
         |              acc[CASE WHEN k > 1 THEN k - 1 ELSE k END])
         |            - CASE WHEN k > 1 THEN
         |                CAST(list_sum(list_slice(x, 1, k - 1))
         |                  AS BIGINT)
         |              ELSE 0 END)))
         |  )[len(b.xs)] AS BIGINT) AS dtw
         |FROM s a JOIN s b ON a.event_type < b.event_type
         |ORDER BY type_a, type_b""".stripMargin) { (s, dir) =>
      val ser = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
        .groupBy(col("event_type"))
        .agg(expr("transform(array_sort(collect_list(" +
          "struct(day, x))), p -> p.x)").as("xs"))
      val a = ser.select(col("event_type").as("type_a"),
        col("xs").as("xa"))
      val b = ser.select(col("event_type").as("type_b"),
        col("xs").as("xb"))
      val dtw =
        """aggregate(
          |  slice(transform(sequence(1, size(xa)), i ->
          |    CASE WHEN i = 1 THEN
          |      transform(sequence(1, size(xb)), j ->
          |        aggregate(transform(sequence(1, j),
          |          t -> abs(element_at(xa, 1) - element_at(xb, t))),
          |          CAST(0 AS BIGINT), (s, t) -> s + t))
          |    ELSE
          |      transform(sequence(1, size(xb)), j ->
          |        abs(element_at(xa, i) - element_at(xb, j))) END),
          |    2, size(xa) - 1),
          |  transform(sequence(1, size(xb)), j ->
          |    aggregate(transform(sequence(1, j),
          |      t -> abs(element_at(xa, 1) - element_at(xb, t))),
          |      CAST(0 AS BIGINT), (s, t) -> s + t)),
          |  (acc, x) -> transform(sequence(1, size(x)), j ->
          |    aggregate(slice(x, 1, j), CAST(0 AS BIGINT),
          |      (s, t) -> s + t)
          |    + array_min(transform(sequence(1, j), k ->
          |        least(element_at(acc, k),
          |          element_at(acc,
          |            CASE WHEN k > 1 THEN k - 1 ELSE k END))
          |        - CASE WHEN k > 1 THEN
          |            aggregate(slice(x, 1, k - 1), CAST(0 AS BIGINT),
          |              (s, t) -> s + t)
          |          ELSE CAST(0 AS BIGINT) END))))""".stripMargin
      a.join(broadcast(b), col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          size(col("xa")).cast("long").as("n_a"),
          size(col("xb")).cast("long").as("n_b"),
          expr(s"CAST(element_at($dtw, size(xb)) AS BIGINT)")
            .as("dtw"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // DAU/WAU/MAU stickiness — the engagement ratio dashboard (what
    // fraction of the weekly/monthly audience shows up on a given
    // day). Windowed DISTINCT users can't ride a window function;
    // the distributive spelling is the bounded EXPANSION: each
    // (user, day) activity row casts membership onto the ≤7 / ≤28
    // calendar days whose trailing window contains it, and one
    // distinct-count per target day finishes it — scale-linear (28×
    // the user-day grain, never user×user), exact integer ratios.
    QuerySpec.sql(
      "events_stickiness",
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d
        |  FROM events),
        |cal AS (SELECT DISTINCT d FROM ud),
        |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau
        |  FROM ud GROUP BY 1),
        |wau AS (
        |  SELECT c.d, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
        |  FROM cal c JOIN ud u ON u.d BETWEEN c.d - 6 AND c.d
        |  GROUP BY 1),
        |mau AS (
        |  SELECT c.d, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
        |  FROM cal c JOIN ud u ON u.d BETWEEN c.d - 27 AND c.d
        |  GROUP BY 1)
        |SELECT CAST(make_timestamp(dau.d * 86400000000) AS DATE) AS day,
        |  dau.dau, wau.wau, mau.mau,
        |  CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS dau_wau_ppm,
        |  CAST(dau.dau * 1000000 // mau.mau AS BIGINT) AS dau_mau_ppm
        |FROM dau JOIN wau ON wau.d = dau.d JOIN mau ON mau.d = dau.d
        |ORDER BY day""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ud = events(s, dir)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
            .as("d"))
        .distinct()
      val udM = graft.functions.Materialize.stable(ud)
      val cal = udM.select(col("d")).distinct()
      val dau = udM.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      def windowed(span: Int, name: String) = udM
        .select(col("user_id"), explode(sequence(col("d"),
          col("d") + (span - 1))).as("d"))
        .join(cal, Seq("d"), "left_semi")
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as(name))
      dau.join(windowed(7, "wau"), Seq("d"))
        .join(windowed(28, "mau"), Seq("d"))
        .select(to_date(timestamp_micros(col("d") * 86400000000L))
            .as("day"),
          col("dau"), col("wau"), col("mau"),
          expr("CAST(dau * 1000000 div wau AS BIGINT)")
            .as("dau_wau_ppm"),
          expr("CAST(dau * 1000000 div mau AS BIGINT)")
            .as("dau_mau_ppm"))
        .orderBy(col("day"))
    },

    // Growth accounting — the weekly user-lifecycle ledger (new /
    // retained / resurrected / churned) every product-analytics
    // review opens with, and the decomposition cohort_retention's
    // single diagonal can't give: active(w) = new + retained +
    // resurrected, and churned(w) counts last week's actives who went
    // dark. One distinct to (user, week) grain, one keyed LAG/LEAD
    // window per user, exact integer counts per week. Churned rows
    // ride the NEXT week's label (the week they became churned), so
    // the four series reconcile: active(w−1) = retained(w) +
    // churned(w).
    QuerySpec.sql(
      "events_user_lifecycle",
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(date_trunc('week', ts) AS DATE)) // 7 AS BIGINT)
        |      AS wk
        |  FROM events),
        |lw AS (
        |  SELECT user_id, wk,
        |    LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS pw,
        |    LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nw
        |  FROM uw),
        |states AS (
        |  SELECT wk,
        |    CASE WHEN pw IS NULL THEN 'new'
        |      WHEN pw = wk - 1 THEN 'retained'
        |      ELSE 'resurrected' END AS state
        |  FROM lw
        |  UNION ALL
        |  SELECT wk + 1, 'churned'
        |  FROM lw WHERE nw IS NULL OR nw > wk + 1)
        |SELECT wk AS week,
        |  CAST(COALESCE(SUM(CASE WHEN state = 'new' THEN 1 END), 0)
        |    AS BIGINT) AS n_new,
        |  CAST(COALESCE(SUM(CASE WHEN state = 'retained' THEN 1 END), 0)
        |    AS BIGINT) AS n_retained,
        |  CAST(COALESCE(SUM(CASE WHEN state = 'resurrected' THEN 1 END),
        |    0) AS BIGINT) AS n_resurrected,
        |  CAST(COALESCE(SUM(CASE WHEN state = 'churned' THEN 1 END), 0)
        |    AS BIGINT) AS n_churned
        |FROM states GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val uw = events(s, dir)
        .select(col("user_id"),
          expr("CAST(datediff(date_trunc('week', ts), " +
            "DATE '1970-01-01') div 7 AS BIGINT)").as("wk"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val lw = uw
        .withColumn("pw", lag(col("wk"), 1).over(w))
        .withColumn("nw", lead(col("wk"), 1).over(w))
      val active = lw.select(col("wk"),
        when(col("pw").isNull, "new")
          .when(col("pw") === col("wk") - 1, "retained")
          .otherwise("resurrected").as("state"))
      val churned = lw
        .filter(col("nw").isNull || col("nw") > col("wk") + 1)
        .select((col("wk") + 1).as("wk"), lit("churned").as("state"))
      active.union(churned)
        .groupBy(col("wk").as("week"))
        .agg(
          coalesce(sum(when(col("state") === "new", 1L)), lit(0L))
            .as("n_new"),
          coalesce(sum(when(col("state") === "retained", 1L)), lit(0L))
            .as("n_retained"),
          coalesce(sum(when(col("state") === "resurrected", 1L)),
            lit(0L)).as("n_resurrected"),
          coalesce(sum(when(col("state") === "churned", 1L)), lit(0L))
            .as("n_churned"))
        .orderBy(col("week"))
    },

    // Inter-event gap HISTOGRAM — the distribution behind
    // w4_avg_event_gap's single mean: per-user consecutive gaps,
    // log₁₀-bucketed by the gap's DECIMAL DIGIT COUNT (the string
    // length of a nonnegative BIGINT — an exact, engine-portable
    // floor(log₁₀)+1 with none of float log's boundary risk). The
    // sessionization / bot-screen families read this curve to pick
    // their thresholds. One keyed LAG, one 10-row aggregate.
    QuerySpec.sql(
      "events_gap_histogram",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |g AS (
        |  SELECT (us - LAG(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id)) // 1000000 AS gap_s
        |  FROM e),
        |b AS (
        |  SELECT CASE WHEN gap_s = 0 THEN 0
        |    ELSE length(CAST(gap_s AS VARCHAR)) END AS digits, gap_s
        |  FROM g WHERE gap_s IS NOT NULL)
        |SELECT CAST(digits AS INT) AS digits,
        |  CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
        |  CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"))
        .select((col("us") - lag(col("us"), 1).over(w)).as("gap_us"))
        .filter(col("gap_us").isNotNull)
        .select(expr("gap_us div 1000000").as("gap_s"))
        .select(when(col("gap_s") === 0, 0)
          .otherwise(length(col("gap_s").cast("string")))
          .cast("int").as("digits"), col("gap_s"))
        .groupBy(col("digits"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_s")).as("min_gap_s"),
          max(col("gap_s")).as("max_gap_s"))
        .orderBy(col("digits"))
    },

    // Difference-in-differences — the quasi-experimental estimator
    // for a launch WITHOUT a randomized holdout: users split by the
    // engine-portable md5 parity (the srm_check assignment), time
    // splits at the range midpoint, and the effect is the interaction
    // (m̄11 − m̄10) − (m̄01 − m̄00) of the four cell means. Cell sums
    // are decimal-exact and counts integral, so the four divisions
    // and two subtractions are the only floats — identical IEEE op
    // order in both engines (the LinReg contract). One pass over
    // events (the midpoint is a 1-row broadcast scalar), 8
    // conditional aggregates, one output row.
    QuerySpec.sql(
      "stats_diff_in_diff",
      s"""WITH c AS (
         |  SELECT CAST(MIN(epoch_us(ts))
         |    + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS BIGINT)
         |    AS mid
         |  FROM events),
         |e AS (
         |  SELECT CASE WHEN CAST(('0x' || substr(md5(
         |      CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT) % 2 = 1
         |      THEN 1 ELSE 0 END AS treat,
         |    CASE WHEN epoch_us(ts) >= mid THEN 1 ELSE 0 END AS post,
         |    value
         |  FROM events, c),
         |g AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         |    CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    ${dsumSql("CASE WHEN treat = 0 AND post = 0 THEN value ELSE 0 END")} AS s00,
         |    ${dsumSql("CASE WHEN treat = 0 AND post = 1 THEN value ELSE 0 END")} AS s01,
         |    ${dsumSql("CASE WHEN treat = 1 AND post = 0 THEN value ELSE 0 END")} AS s10,
         |    ${dsumSql("CASE WHEN treat = 1 AND post = 1 THEN value ELSE 0 END")} AS s11
         |  FROM e)
         |SELECT n00, n01, n10, n11,
         |  ${DiD.mean("00")} AS m00, ${DiD.mean("01")} AS m01,
         |  ${DiD.mean("10")} AS m10, ${DiD.mean("11")} AS m11,
         |  ${DiD.effect} AS did
         |FROM g""".stripMargin) { (s, dir) =>
      val mid = events(s, dir)
        .agg(expr("CAST(MIN(unix_micros(ts)) + " +
          "(MAX(unix_micros(ts)) - MIN(unix_micros(ts))) div 2 " +
          "AS BIGINT)").as("mid"))
      val e = events(s, dir).crossJoin(broadcast(mid))
        .select(
          (graft.functions.Md5Prefix.md5_prefix_long(
            col("user_id").cast("string"), 13) % 2 === 1)
            .cast("int").as("treat"),
          (unix_micros(col("ts")) >= col("mid")).cast("int").as("post"),
          col("value"))
      val g = e.agg(
        sum(when(col("treat") === 0 && col("post") === 0, 1)
          .otherwise(0)).cast("long").as("n00"),
        sum(when(col("treat") === 0 && col("post") === 1, 1)
          .otherwise(0)).cast("long").as("n01"),
        sum(when(col("treat") === 1 && col("post") === 0, 1)
          .otherwise(0)).cast("long").as("n10"),
        sum(when(col("treat") === 1 && col("post") === 1, 1)
          .otherwise(0)).cast("long").as("n11"),
        dsum(when(col("treat") === 0 && col("post") === 0,
          col("value")).otherwise(0)).as("s00"),
        dsum(when(col("treat") === 0 && col("post") === 1,
          col("value")).otherwise(0)).as("s01"),
        dsum(when(col("treat") === 1 && col("post") === 0,
          col("value")).otherwise(0)).as("s10"),
        dsum(when(col("treat") === 1 && col("post") === 1,
          col("value")).otherwise(0)).as("s11"))
      g.select(col("n00"), col("n01"), col("n10"), col("n11"),
        expr(DiD.mean("00")).as("m00"), expr(DiD.mean("01")).as("m01"),
        expr(DiD.mean("10")).as("m10"), expr(DiD.mean("11")).as("m11"),
        expr(DiD.effect).as("did"))
    },

    // XmR control chart (individuals + moving range) — the SPC
    // stalwart beside the rolling Bollinger band and the CUSUM: FIXED
    // control limits x̄ ± 2.66·M̄R from the whole series (2.66 = 3/d₂),
    // flagging Western-Electric zones: beyond 3σ, and the zone-A band
    // beyond 2σ (1.77·M̄R — the stricter rule that still fires on a
    // series stable enough never to breach 3σ). Everything
    // cross-multiplies into exact integers: |x·n − Sx| · m · 100
    // against {266, 177} · S_MR · n decides each day on identical
    // BIGINTs (x̄ from n days, M̄R from m = n−1 absolute consecutive
    // differences). One daily rollup + one keyed LAG + a 1-row
    // broadcast per type.
    QuerySpec.sql(
      "ts_xmr_control",
      """WITH d AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |mr AS (
        |  SELECT event_type, day, y,
        |    ABS(y - LAG(y) OVER (PARTITION BY event_type ORDER BY day))
        |      AS r
        |  FROM d),
        |c AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sx,
        |    CAST(COUNT(r) AS BIGINT) AS m,
        |    CAST(COALESCE(SUM(r), 0) AS BIGINT) AS smr
        |  FROM mr GROUP BY 1)
        |SELECT mr.event_type, mr.day, mr.y,
        |  CAST(mr.y * c.n - c.sx AS BIGINT) AS dev_xn,
        |  CASE WHEN mr.y * c.n - c.sx > 0 THEN 'above' ELSE 'below' END
        |    AS side,
        |  CASE WHEN ABS(mr.y * c.n - c.sx) * c.m * 100
        |    > 266 * c.smr * c.n THEN 'beyond_3sigma'
        |    ELSE 'zone_a' END AS zone
        |FROM mr JOIN c ON c.event_type = mr.event_type
        |WHERE c.m > 0 AND ABS(mr.y * c.n - c.sx) * c.m * 100
        |  > 177 * c.smr * c.n
        |ORDER BY mr.event_type, mr.day""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val mr = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .withColumn("r", abs(col("y") - lag(col("y"), 1).over(w)))
      val c = mr.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sx"),
          count(col("r")).as("m"),
          coalesce(sum(col("r")), lit(0L)).as("smr"))
      mr.join(broadcast(c), Seq("event_type"))
        .filter(col("m") > 0 &&
          abs(col("y") * col("n") - col("sx")) * col("m") * 100 >
            lit(177) * col("smr") * col("n"))
        .select(col("event_type"), col("day"), col("y"),
          (col("y") * col("n") - col("sx")).cast("long").as("dev_xn"),
          when(col("y") * col("n") - col("sx") > 0, "above")
            .otherwise("below").as("side"),
          when(abs(col("y") * col("n") - col("sx")) * col("m") * 100 >
            lit(266) * col("smr") * col("n"), "beyond_3sigma")
            .otherwise("zone_a").as("zone"))
        .orderBy(col("event_type"), col("day"))
    },

    // Bollinger-band breakout detection — the rolling-volatility
    // screen beside ts_anomaly_zscore's global one: a day breaks out
    // when its count leaves the trailing 7-day ±2σ band. The test
    // |y − S/n| > 2σ is cleared of ALL division and square roots by
    // cross-multiplying to (n·y − S)² > 4·(n·Q − S²) over the exact
    // integer window sums S, Q (population σ over the window) — both
    // engines decide each day on identical BIGINTs. One keyed
    // 7-row rolling window over the daily rollup; raw events are
    // touched once.
    QuerySpec.sql(
      "ts_bollinger_breakouts",
      """WITH d AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, y,
        |    CAST(COUNT(*) OVER win AS BIGINT) AS n,
        |    CAST(SUM(y) OVER win AS BIGINT) AS s,
        |    CAST(SUM(y * y) OVER win AS BIGINT) AS q
        |  FROM d
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, y AS n_events, n AS win_days,
        |  CAST(n * y - s AS BIGINT) AS dev_xn,
        |  CAST(4 * (n * q - s * s) AS BIGINT) AS band_xn2
        |FROM w
        |WHERE n >= 4
        |  AND (n * y - s) * (n * y - s) > 4 * (n * q - s * s)
        |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val win = Window.partitionBy(col("event_type"))
        .orderBy(col("day")).rowsBetween(-6, 0)
      events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .select(col("event_type"), col("day"), col("y"),
          count(lit(1)).over(win).as("n"),
          sum(col("y")).over(win).as("s"),
          sum(col("y") * col("y")).over(win).as("q"))
        .filter(col("n") >= 4 &&
          (col("n") * col("y") - col("s")) *
            (col("n") * col("y") - col("s")) >
            lit(4) * (col("n") * col("q") - col("s") * col("s")))
        .select(col("event_type"), col("day"), col("y").as("n_events"),
          col("n").as("win_days"),
          (col("n") * col("y") - col("s")).cast("long").as("dev_xn"),
          (lit(4) * (col("n") * col("q") - col("s") * col("s")))
            .cast("long").as("band_xn2"))
        .orderBy(col("event_type"), col("day"))
    },

    // Spearman rank correlation — the distribution-free companion to
    // the parametric tests: per event-type-day, does `value` TREND
    // with time within the day? (The monotone-trend question
    // ts_theil_sen answers with a slope, answered here with a bounded
    // correlation.) Tie-averaged ranks are carried as exact ×2
    // integers via the rank identity 2·avgrank = rank_asc − rank_desc
    // + n + 1 (scaling cancels in the correlation), so every sum is
    // an exact BIGINT and the cross terms run in double in identical
    // IEEE op order (the AutoCorr contract — exact to n≈2·10⁵/group;
    // groups here are type-days, 739 max at sf0.1). One window
    // shuffle keyed by (type, day), then a map-side-combinable agg.
    QuerySpec.sql(
      "stats_spearman",
      s"""WITH e AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |    epoch_us(ts) AS us, value
         |  FROM events),
         |r AS (
         |  SELECT event_type, day,
         |    CAST(RANK() OVER (PARTITION BY event_type, day ORDER BY us)
         |      - RANK() OVER (PARTITION BY event_type, day ORDER BY us DESC)
         |      + COUNT(*) OVER (PARTITION BY event_type, day) + 1
         |      AS BIGINT) AS rx,
         |    CAST(RANK() OVER (PARTITION BY event_type, day ORDER BY value)
         |      - RANK() OVER (PARTITION BY event_type, day ORDER BY value DESC)
         |      + COUNT(*) OVER (PARTITION BY event_type, day) + 1
         |      AS BIGINT) AS ry
         |  FROM e),
         |a AS (
         |  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(rx * ry) AS BIGINT) AS sxy,
         |    CAST(SUM(rx) AS BIGINT) AS sx,
         |    CAST(SUM(ry) AS BIGINT) AS sy,
         |    CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         |    CAST(SUM(ry * ry) AS BIGINT) AS syy
         |  FROM r GROUP BY 1, 2)
         |SELECT event_type, day, n, ${Spearman.rho} AS rho
         |FROM a WHERE n >= 3
         |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type"), col("day"))
      val r = events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("us"), col("value"))
        .select(col("event_type"), col("day"),
          (rank().over(w.orderBy(col("us")))
            - rank().over(w.orderBy(col("us").desc))
            + count(lit(1)).over(w) + 1).cast("long").as("rx"),
          (rank().over(w.orderBy(col("value")))
            - rank().over(w.orderBy(col("value").desc))
            + count(lit(1)).over(w) + 1).cast("long").as("ry"))
      r.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("rx") * col("ry")).as("sxy"),
          sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"))
        .filter(col("n") >= 3)
        .select(col("event_type"), col("day"), col("n"),
          expr(Spearman.rho).as("rho"))
        .orderBy(col("event_type"), col("day"))
    },

    // Power analysis / minimum-detectable-effect — the question asked
    // BEFORE an experiment ships: splitting this metric's n
    // observations into two arms, what lift could a two-sample test
    // even see at α=0.05, power=0.8? MDE = (z₀.₉₇₅+z₀.₈)·σ·√(2/n_arm)
    // with the z-sum folded to the constant 2.801585. Variance comes
    // from EXACT decimal power sums (the a_moments_stats discipline:
    // Σx, Σx² order-independent, the only floats are single correctly-
    // rounded ops on identical operands), so the classically-float
    // power calculation hash-compares.
    QuerySpec.sql(
      "stats_power_mde",
      s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) // 2 AS BIGINT) AS n_arm,
         |  ${dsumSql("value")} / COUNT(*) AS mean_value,
         |  (${dsumSql("value * value")}
         |    - ${dsumSql("value")} * ${dsumSql("value")} / COUNT(*))
         |    / (COUNT(*) - 1) AS var_value,
         |  2.801585 * sqrt(2 * ((${dsumSql("value * value")}
         |    - ${dsumSql("value")} * ${dsumSql("value")} / COUNT(*))
         |    / (COUNT(*) - 1)) / (COUNT(*) // 2)) AS mde
         |FROM events
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("__s"),
          dsum(col("value") * col("value")).as("__q"))
        .select(col("event_type"), col("n"),
          expr("CAST(n div 2 AS BIGINT)").as("n_arm"),
          (col("__s") / col("n")).as("mean_value"),
          ((col("__q") - col("__s") * col("__s") / col("n")) /
            (col("n") - 1)).as("var_value"),
          (lit(2.801585) * sqrt(lit(2) *
            ((col("__q") - col("__s") * col("__s") / col("n")) /
              (col("n") - 1)) / expr("n div 2"))).as("mde"))
        .orderBy(col("event_type"))
    },

    // Sample-ratio-mismatch check — the experiment-health gate that
    // runs BEFORE any read-out: for each experiment, users are
    // assigned by the engine-portable md5 hash (salted per experiment,
    // so the three assignments are independent) and the observed 50/50
    // split is χ²-tested. χ² for two equal-expectation bins collapses
    // to (n_a − n_b)²/N, carried as one exact integer micro-rational
    // (the ab_ztest discipline) so the verdict is decided on the same
    // integer in both engines. One distinct-user aggregate (the only
    // row-scale pass) → 3 experiments × parity fold.
    QuerySpec.sql(
      "stats_srm_check",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |e AS (SELECT UNNEST(['exp_a', 'exp_b', 'exp_c']) AS exp),
        |a AS (
        |  SELECT exp,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
        |      || ':' || exp), 1, 8)) AS BIGINT) % 2 AS arm
        |  FROM u CROSS JOIN e),
        |g AS (
        |  SELECT exp,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM a GROUP BY 1)
        |SELECT exp, n_a, n_b,
        |  CAST(CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000000
        |    // (n_a + n_b) AS BIGINT) AS chi2_micro,
        |  CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000000
        |    // (n_a + n_b) > 3841459 AS srm
        |FROM g ORDER BY exp""".stripMargin) { (s, dir) =>
      import graft.functions.Md5Prefix
      events(s, dir)
        .select(col("user_id")).distinct()
        .select(col("user_id"),
          explode(array(lit("exp_a"), lit("exp_b"), lit("exp_c")))
            .as("exp"))
        .select(col("exp"),
          (Md5Prefix.md5_prefix_long(
            concat(col("user_id").cast("string"), lit(":"), col("exp")),
            8) % 2).as("arm"))
        .groupBy(col("exp"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
        .select(col("exp"), col("n_a"), col("n_b"),
          expr("CAST(CAST(n_a - n_b AS DECIMAL(38,0)) * (n_a - n_b)" +
            " * 1000000 div (n_a + n_b) AS BIGINT)").as("chi2_micro"),
          expr("CAST(n_a - n_b AS DECIMAL(38,0)) * (n_a - n_b)" +
            " * 1000000 div (n_a + n_b) > 3841459").as("srm"))
        .orderBy(col("exp"))
    },

    // Exact sign test per series (Arbuthnott 1710, the oldest test
    // there is): of each event type's day-over-day moves, k ups out
    // of n non-ties — under H0 the count is Binomial(n, 1/2), and the
    // two-sided p-value is an EXACT RATIONAL p_num/2^n whose
    // numerator is a binomial tail sum of integer C(n,i). Both
    // engines build the coefficients by the multiplicative recurrence
    // C(n,i) = C(n,i-1)·(n-i+1)/i (each step divides exactly), Spark
    // as a per-series `aggregate` fold, DuckDB as the textbook
    // recursive CTE — so a classically-continuous hypothesis test
    // hash-compares with NO float anywhere. The series is
    // calendar-bounded (n = days-1); n > 55 would overflow the
    // BIGINT recurrence and both engines fail loudly (DuckDB checks
    // overflow; Spark raise_error) rather than return a wrong tail —
    // beyond that, a normal-approximation variant is the right tool.
    QuerySpec.sql(
      "stats_sign_test",
      s"""WITH RECURSIVE $signTestCtes
         |SELECT series, n, k, p_num, p_den,
         |  20 * p_num <= p_den AS significant
         |FROM sgn ORDER BY series""".stripMargin) { (s, dir) =>
      signTest(s, dir)
        .withColumn("significant", lit(20) * col("p_num") <= col("p_den"))
        .select(col("series"), col("n"), col("k"), col("p_num"),
          col("p_den"), col("significant"))
        .orderBy(col("series"))
    },

    // Wald–Wolfowitz runs test (1940) per series — the nonparametric
    // randomness check beside the sign test: of the tie-dropped
    // day-over-day signs, the number of RUNS R against its exact
    // conditional null distribution given (n1 ups, n2 downs):
    //   P(R=2k)   = 2·C(n1−1,k−1)·C(n2−1,k−1) / C(n,n1)
    //   P(R=2k+1) = [C(n1−1,k)·C(n2−1,k−1)+C(n1−1,k−1)·C(n2−1,k)]
    //               / C(n,n1).
    // The left tail P(R ≤ R_obs) flags CLUSTERING (trend/regime
    // persistence — too few runs). Everything is the exact integer
    // rational p_num/C(n,n1): binomial rows from the same
    // multiplicative recurrence as stats_sign_test (recursive CTE /
    // per-series fold), the tail a ≤n-term sum of coefficient
    // products. A single-sign series (the cum_users regime) is the
    // degenerate R=1 edge: p ≡ 1 by definition, pinned explicitly.
    // Same calendar bound and loud n > 55 overflow behavior as the
    // sign test.
    QuerySpec.sql(
      "stats_runs_test",
      s"""WITH RECURSIVE $seriesDiffCtes,
         |sg AS (
         |  SELECT series, day, CASE WHEN dx > 0 THEN 1 ELSE 0 END AS s
         |  FROM dd WHERE dx IS NOT NULL AND dx <> 0),
         |ch AS (
         |  SELECT series, s,
         |    CASE WHEN LAG(s) OVER (PARTITION BY series ORDER BY day)
         |      <> s THEN 1 ELSE 0 END AS chg
         |  FROM sg),
         |rt AS (
         |  SELECT series, CAST(SUM(s) AS BIGINT) AS n1,
         |    CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2,
         |    CAST(1 + COALESCE(SUM(chg), 0) AS BIGINT) AS r_obs
         |  FROM ch GROUP BY 1),
         |bau AS (
         |  SELECT DISTINCT series, a FROM (
         |    SELECT series, n1 - 1 AS a FROM rt WHERE n1 > 0 AND n2 > 0
         |    UNION ALL
         |    SELECT series, n2 - 1 FROM rt WHERE n1 > 0 AND n2 > 0
         |    UNION ALL
         |    SELECT series, n1 + n2 FROM rt WHERE n1 > 0 AND n2 > 0) u),
         |bb AS (
         |  SELECT series, a, CAST(0 AS BIGINT) AS i,
         |    CAST(1 AS BIGINT) AS c
         |  FROM bau
         |  UNION ALL
         |  SELECT series, a, i + 1, c * (a - i) // (i + 1)
         |  FROM bb WHERE i < a),
         |rg AS (
         |  SELECT rt.series, rt.n1, rt.n2, CAST(t.r AS BIGINT) AS r
         |  FROM rt, LATERAL (SELECT unnest(range(2, rt.r_obs + 1))
         |    AS r) t
         |  WHERE rt.n1 > 0 AND rt.n2 > 0),
         |term AS (
         |  SELECT g.series,
         |    CASE WHEN g.r % 2 = 0
         |      THEN 2 * COALESCE(c1m.c, 0) * COALESCE(c2m.c, 0)
         |      ELSE COALESCE(c1k.c, 0) * COALESCE(c2m.c, 0)
         |         + COALESCE(c1m.c, 0) * COALESCE(c2k.c, 0)
         |    END AS num
         |  FROM rg g
         |  LEFT JOIN bb c1m ON c1m.series = g.series
         |    AND c1m.a = g.n1 - 1 AND c1m.i = g.r // 2 - 1
         |  LEFT JOIN bb c1k ON c1k.series = g.series
         |    AND c1k.a = g.n1 - 1 AND c1k.i = g.r // 2
         |  LEFT JOIN bb c2m ON c2m.series = g.series
         |    AND c2m.a = g.n2 - 1 AND c2m.i = g.r // 2 - 1
         |  LEFT JOIN bb c2k ON c2k.series = g.series
         |    AND c2k.a = g.n2 - 1 AND c2k.i = g.r // 2),
         |pn AS (
         |  SELECT series, CAST(SUM(num) AS BIGINT) AS p_num
         |  FROM term GROUP BY 1),
         |pd AS (
         |  SELECT b.series, b.c AS p_den
         |  FROM bb b JOIN rt ON rt.series = b.series
         |  WHERE b.a = rt.n1 + rt.n2 AND b.i = rt.n1)
         |SELECT rt.series, rt.n1, rt.n2, rt.r_obs,
         |  CAST(CASE WHEN rt.n1 = 0 OR rt.n2 = 0 THEN 1
         |    ELSE pn.p_num END AS BIGINT) AS p_num,
         |  CAST(CASE WHEN rt.n1 = 0 OR rt.n2 = 0 THEN 1
         |    ELSE pd.p_den END AS BIGINT) AS p_den,
         |  20 * CASE WHEN rt.n1 = 0 OR rt.n2 = 0 THEN 1
         |      ELSE pn.p_num END
         |    <= CASE WHEN rt.n1 = 0 OR rt.n2 = 0 THEN 1
         |      ELSE pd.p_den END AS clustered
         |FROM rt
         |LEFT JOIN pn ON pn.series = rt.series
         |LEFT JOIN pd ON pd.series = rt.series
         |ORDER BY rt.series""".stripMargin) { (s, dir) =>
      seriesDiffs(s, dir)
        .filter(col("dx").isNotNull && col("dx") =!= 0)
        .select(col("series"), col("day"),
          when(col("dx") > 0, 1L).otherwise(0L).as("sg"))
        .groupBy(col("series"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(day, sg))), p -> p.sg)")
          .as("sgs"))
        .select(col("series"),
          expr("aggregate(sgs, 0L, (a, v) -> a + v)").as("n1"),
          expr("CAST(size(sgs) AS BIGINT) - " +
            "aggregate(sgs, 0L, (a, v) -> a + v)").as("n2"),
          expr("""1L + aggregate(
            |  zip_with(slice(sgs, 1, size(sgs) - 1),
            |    slice(sgs, 2, size(sgs) - 1),
            |    (x, y) -> CASE WHEN x <> y THEN 1L ELSE 0L END),
            |  0L, (a, v) -> a + v)""".stripMargin).as("r_obs"))
        // binomial coefficient arrays C(a, 0..a) for the three a's —
        // built only on mixed-sign rows (CaseWhen is lazy per row, so
        // a degenerate single-sign series never runs the recurrence
        // or its overflow guard)
        .withColumn("mixed", col("n1") > 0 && col("n2") > 0)
        .withColumn("c1", when(col("mixed"), binomArr("n1 - 1"))
          .otherwise(array(lit(1L))))
        .withColumn("c2", when(col("mixed"), binomArr("n2 - 1"))
          .otherwise(array(lit(1L))))
        .withColumn("cn", when(col("mixed"), binomArr("n1 + n2"))
          .otherwise(array(lit(1L))))
        .select(col("series"), col("n1"), col("n2"), col("r_obs"),
          expr("""CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 1
            |  ELSE aggregate(sequence(2, CAST(r_obs AS INT)),
            |    CAST(0 AS BIGINT),
            |    (acc, r) -> acc + CASE WHEN r % 2 = 0
            |      THEN 2
            |        * (CASE WHEN size(c1) >= r div 2
            |             THEN element_at(c1, CAST(r div 2 AS INT)) ELSE 0L END)
            |        * (CASE WHEN size(c2) >= r div 2
            |             THEN element_at(c2, CAST(r div 2 AS INT)) ELSE 0L END)
            |      ELSE (CASE WHEN size(c1) >= r div 2 + 1
            |             THEN element_at(c1, CAST(r div 2 + 1 AS INT)) ELSE 0L END)
            |          * (CASE WHEN size(c2) >= r div 2
            |             THEN element_at(c2, CAST(r div 2 AS INT)) ELSE 0L END)
            |        + (CASE WHEN size(c1) >= r div 2
            |             THEN element_at(c1, CAST(r div 2 AS INT)) ELSE 0L END)
            |          * (CASE WHEN size(c2) >= r div 2 + 1
            |             THEN element_at(c2, CAST(r div 2 + 1 AS INT)) ELSE 0L END)
            |      END)
            |END AS BIGINT)""".stripMargin).as("p_num"),
          expr("""CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 1
            |  ELSE element_at(cn, CAST(n1 + 1 AS INT))
            |END AS BIGINT)""".stripMargin).as("p_den"))
        .withColumn("clustered",
          lit(20) * col("p_num") <= col("p_den"))
        .orderBy(col("series"))
    },

    // Benjamini–Hochberg FDR control (1995) over the per-series sign
    // tests — the multiple-testing correction a platform needs the
    // moment it monitors MANY metrics (m tests at α each yields mα
    // false alarms; BH caps the FALSE DISCOVERY RATE at q instead).
    // Everything stays exact: the rational p-values are made
    // comparable by scaling every numerator to the common denominator
    // 2^nmax (p_scaled = p_num·2^(nmax-n), exact integers), the rank
    // comes from the PrefixSum global cumsum (no unpartitioned
    // window), and the step-up condition p_(i) ≤ i·q/m is the
    // cross-multiplied 10·m·p_scaled ≤ i·2^nmax (q = 0.10). The
    // step-up cutoff (LARGEST passing rank, then reject all ranks
    // below it — the part naive implementations get wrong) is one
    // broadcast scalar join. Bonferroni flags ride along for
    // contrast. Headroom: p_scaled ≤ 2^nmax ≤ 2^55 stays in BIGINT
    // by construction, and BOTH cross-multiplied comparisons (BH
    // step-up and Bonferroni) run in DECIMAL(38,0) ≡ HUGEINT, so
    // 10·m·2^nmax just needs < 10^38 — the full n ≤ 55 envelope
    // holds for any m up to ~10^20, i.e. effectively unbounded.
    QuerySpec.sql(
      "stats_fdr_bh",
      s"""WITH RECURSIVE $signTestCtes,
         |mm AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(MAX(n) AS BIGINT) AS nmax
         |  FROM sgn),
         |sc AS (
         |  SELECT s.series, s.n, s.k, s.p_num, s.p_den, mm.m,
         |    mm.nmax,
         |    s.p_num * (1::BIGINT << CAST(mm.nmax - s.n AS INT))
         |      AS p_scaled
         |  FROM sgn s, mm),
         |rk AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_scaled,
         |    series) AS BIGINT) AS rnk
         |  FROM sc),
         |th AS (
         |  SELECT COALESCE(MAX(CASE WHEN
         |      10 * m * CAST(p_scaled AS HUGEINT) <=
         |      CAST(rnk AS HUGEINT)
         |        * (1::BIGINT << CAST(nmax AS INT))
         |    THEN rnk END), 0) AS cutoff
         |  FROM rk)
         |SELECT series, n, k, p_num, p_den, rnk AS rank,
         |  rnk <= th.cutoff AS bh_reject,
         |  20 * m * CAST(p_num AS HUGEINT) <= p_den AS bonf_reject
         |FROM rk, th ORDER BY rank, series""".stripMargin) { (s, dir) =>
      import graft.functions.PrefixSum
      val sgn = Materialize.stable(signTest(s, dir))
      val mm = sgn.agg(count(lit(1)).cast("long").as("m"),
        max(col("n")).cast("long").as("nmax"))
      val sc = sgn.crossJoin(broadcast(mm))
        .withColumn("p_scaled", expr(
          "p_num * shiftleft(CAST(1 AS BIGINT), CAST(nmax - n AS INT))"))
      // global rank over the (tiny, bounded-by-event-type-domain)
      // test table without an unpartitioned window; stable'd because
      // the rank table fans out to TWO consumers (threshold fold +
      // final verdict join) — one truncation beats replanning the
      // cumsum subtree per consumer (r16 measured)
      val rk = Materialize.stable(PrefixSum.globalCumsum(sc,
        Seq(col("p_scaled"), col("series")), lit(1L), "rnk"))
      val th = rk.agg(coalesce(max(when(expr(
          "10 * m * CAST(p_scaled AS DECIMAL(38,0)) <= " +
            "CAST(rnk AS DECIMAL(38,0)) * shiftleft(CAST(1 AS BIGINT)," +
            " CAST(nmax AS INT))"), col("rnk"))), lit(0L)).as("cutoff"))
      rk.crossJoin(broadcast(th))
        .select(col("series"), col("n"), col("k"), col("p_num"),
          col("p_den"), col("rnk").as("rank"),
          (col("rnk") <= col("cutoff")).as("bh_reject"),
          expr("20 * m * CAST(p_num AS DECIMAL(38,0)) <= p_den")
            .as("bonf_reject"))
        .orderBy(col("rank"), col("series"))
    },

    // Cochran's Q — the k-treatment generalization of McNemar over
    // MATCHED binary outcomes: subjects are users, treatments are
    // event types, x(i,j) = user i's count of type j STRICTLY ABOVE
    // the per-type mean count (cross-multiplied cnt·n_users > total_j
    // — mean-relative, so the split is non-degenerate at every SF; the
    // naive "ever did type j" outcome is all-ones on this fixture and
    // zeroes the denominator). Q tests whether the k above-average
    // rates differ given the per-user pairing. ONE exact integer
    // rational: Q = (k−1)(k·ΣC_j² − N²)/(kN − ΣR_i²) with C_j the
    // per-treatment hit counts and R_i the per-user row sums (the
    // denominator is ΣR_i(k−R_i) ≥ 0, zero only when every flagged
    // user is flagged in ALL k types — NULL-guarded). Subjects with
    // R_i = 0 contribute nothing to either sum, so the zero grid is
    // never materialized. Plan: one (user, type) count aggregate, a
    // broadcast per-type threshold join, two bounded folds — no
    // window, no pairing join.
    QuerySpec.sql(
      "stats_cochran_q",
      """WITH u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |  AS nu FROM events),
        |cnt AS (SELECT user_id, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |tt AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total
        |  FROM cnt GROUP BY 1),
        |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM tt),
        |b AS (SELECT c.user_id, c.event_type
        |  FROM cnt c JOIN tt t ON t.event_type = c.event_type, u
        |  WHERE c.cnt * u.nu > t.total),
        |r AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS r
        |  FROM b GROUP BY 1),
        |c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1),
        |ca AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_total,
        |  CAST(COALESCE(SUM(c * c), 0) AS BIGINT) AS sum_c2 FROM c),
        |ra AS (SELECT CAST(COALESCE(SUM(r * r), 0) AS BIGINT)
        |  AS sum_r2 FROM r)
        |SELECT kk.k AS k, u.nu AS n_subjects, n_total, sum_c2, sum_r2,
        |  CAST(CASE WHEN kk.k * n_total > sum_r2 THEN
        |    (kk.k - 1) * (kk.k * sum_c2 - n_total * n_total) * 1000000
        |      // (kk.k * n_total - sum_r2) END AS BIGINT) AS q_micro
        |FROM kk, u, ca, ra""".stripMargin) { (s, dir) =>
      val cnt = Materialize.stable(events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("cnt")))
      val u = cnt.agg(countDistinct(col("user_id")).cast("long")
        .as("nu"))
      val tt = cnt.groupBy(col("event_type"))
        .agg(sum(col("cnt")).cast("long").as("total"))
      val kk = tt.agg(count(lit(1)).cast("long").as("k"))
      val b = Materialize.stable(cnt
        .join(broadcast(tt), Seq("event_type"))
        .crossJoin(broadcast(u))
        .filter(col("cnt") * col("nu") > col("total"))
        .select(col("user_id"), col("event_type")))
      val ra = b.groupBy(col("user_id"))
        .agg(count(lit(1)).as("r"))
        .agg(coalesce(sum(col("r") * col("r")), lit(0L)).cast("long")
          .as("sum_r2"))
      val ca = b.groupBy(col("event_type"))
        .agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("n_total"),
          coalesce(sum(col("c") * col("c")), lit(0L)).cast("long")
            .as("sum_c2"))
      kk.crossJoin(broadcast(u)).crossJoin(broadcast(ca))
        .crossJoin(broadcast(ra))
        .select(col("k"), col("nu").as("n_subjects"), col("n_total"),
          col("sum_c2"), col("sum_r2"),
          expr("CAST(CASE WHEN k * n_total > sum_r2 THEN " +
            "(k - 1) * (k * sum_c2 - n_total * n_total) * 1000000 div " +
            "(k * n_total - sum_r2) END AS BIGINT)").as("q_micro"))
    },

    // Friedman's test — the blocked nonparametric ANOVA: blocks are
    // days, treatments are event types, the response is the daily
    // count, restricted to complete blocks (days where every type
    // fired). Within-block tie-averaged ranks ride the ×2 identity
    // (s = 2·cnt_less + cnt_eq + 1, an integer), and the
    // TIE-CORRECTED statistic is one exact rational in those
    // integers: χ²_F = (k−1)·Σ_j(S_j − b(k+1))² / (Σs² − bk(k+1)²)
    // (the 1/4 scale factors cancel). Denominator zero ⟺ every block
    // is an all-tie — NULL-guarded. Plan: the daily aggregate, then a
    // within-block k×k equi-join on the ≤|days|·k frame — pairing
    // cost is k² per block, never corpus².
    QuerySpec.sql(
      "stats_friedman",
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
        |  FROM daily),
        |fd AS (SELECT day FROM daily GROUP BY 1
        |  HAVING CAST(COUNT(*) AS BIGINT) = (SELECT k FROM kk)),
        |f AS (SELECT d.day, d.event_type, d.x
        |  FROM daily d JOIN fd ON d.day = fd.day),
        |rk AS (
        |  SELECT a.day, a.event_type,
        |    CAST(2 * SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
        |      + SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1
        |      AS BIGINT) AS s
        |  FROM f a JOIN f b ON a.day = b.day GROUP BY 1, 2),
        |bb AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS b FROM f),
        |sj AS (SELECT event_type, CAST(SUM(s) AS BIGINT) AS s_j
        |  FROM rk GROUP BY 1),
        |s2 AS (SELECT CAST(SUM(s * s) AS BIGINT) AS sum_s2 FROM rk),
        |nm AS (SELECT CAST(SUM((s_j - bb.b * (kk.k + 1))
        |    * (s_j - bb.b * (kk.k + 1))) AS BIGINT) AS num
        |  FROM sj, bb, kk)
        |SELECT kk.k AS k, bb.b AS b, num,
        |  CAST(sum_s2 - bb.b * kk.k * (kk.k + 1) * (kk.k + 1)
        |    AS BIGINT) AS den,
        |  CAST(CASE WHEN sum_s2 > bb.b * kk.k * (kk.k + 1) * (kk.k + 1)
        |    THEN (kk.k - 1) * num * 1000000
        |      // (sum_s2 - bb.b * kk.k * (kk.k + 1) * (kk.k + 1))
        |    END AS BIGINT) AS chi2_micro
        |FROM kk, bb, nm, s2""".stripMargin) { (s, dir) =>
      val daily = Materialize.stable(events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("x")))
      val kk = daily.agg(countDistinct(col("event_type")).cast("long")
        .as("k"))
      val f = Materialize.stable(daily
        .groupBy(col("day")).agg(count(lit(1)).as("nt"))
        .crossJoin(broadcast(kk))
        .filter(col("nt") === col("k"))
        .select(col("day"))
        .join(daily, Seq("day")))
      val rk = f.as("a")
        .join(f.as("b"), col("a.day") === col("b.day"))
        .groupBy(col("a.day").as("day"),
          col("a.event_type").as("event_type"))
        .agg((lit(2) * sum(when(col("b.x") < col("a.x"), 1)
            .otherwise(0)) +
          sum(when(col("b.x") === col("a.x"), 1).otherwise(0)) + lit(1))
          .cast("long").as("s"))
      val rkM = Materialize.stable(rk)
      val bb = f.agg(countDistinct(col("day")).cast("long").as("b"))
      val sj = rkM.groupBy(col("event_type"))
        .agg(sum(col("s")).cast("long").as("s_j"))
      val s2 = rkM.agg(sum(col("s") * col("s")).cast("long")
        .as("sum_s2"))
      val nm = sj.crossJoin(broadcast(bb)).crossJoin(broadcast(kk))
        .agg(sum((col("s_j") - col("b") * (col("k") + 1)) *
          (col("s_j") - col("b") * (col("k") + 1))).cast("long")
          .as("num"))
      kk.crossJoin(broadcast(bb)).crossJoin(broadcast(nm))
        .crossJoin(broadcast(s2))
        .select(col("k"), col("b"), col("num"),
          expr("CAST(sum_s2 - b * k * (k + 1) * (k + 1) AS BIGINT)")
            .as("den"),
          expr("CAST(CASE WHEN sum_s2 > b * k * (k + 1) * (k + 1) " +
            "THEN (k - 1) * num * 1000000 div " +
            "(sum_s2 - b * k * (k + 1) * (k + 1)) END AS BIGINT)")
            .as("chi2_micro"))
    },

    // Page's trend test — the ORDERED-alternative Friedman: with the
    // treatments in a hypothesized order (the order is the test's
    // parameter; this gate fixes it to the lexicographic event-type
    // order), L = Σ j·R_j detects a monotone trend the omnibus
    // Friedman dilutes. Same complete-block ×2-rank frame; L2 = 2L is
    // an exact integer folded from the SORTED per-treatment rank sums
    // (one aggregate over the k-row table — no window, not even a
    // k-row one), and both the z² micro readout and the two-sided
    // z > 1.96 verdict are integer rationals:
    // z² = 9(k−1)(2L2 − bk(k+1)²)² / (b(k³−k)²), verdict cross-
    // multiplied with 1.96² = 2401/625. Ranks are tie-averaged (the
    // classic variance assumes no ties — documented approximation,
    // identical in both engines).
    QuerySpec.sql(
      "stats_page_trend",
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
        |  FROM daily),
        |fd AS (SELECT day FROM daily GROUP BY 1
        |  HAVING CAST(COUNT(*) AS BIGINT) = (SELECT k FROM kk)),
        |f AS (SELECT d.day, d.event_type, d.x
        |  FROM daily d JOIN fd ON d.day = fd.day),
        |rk AS (
        |  SELECT a.day, a.event_type,
        |    CAST(2 * SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
        |      + SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1
        |      AS BIGINT) AS s
        |  FROM f a JOIN f b ON a.day = b.day GROUP BY 1, 2),
        |bb AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS b FROM f),
        |sj AS (SELECT event_type, CAST(SUM(s) AS BIGINT) AS s_j
        |  FROM rk GROUP BY 1),
        |ll AS (SELECT CAST(SUM(j * s_j) AS BIGINT) AS l2 FROM (
        |  SELECT s_j, ROW_NUMBER() OVER (ORDER BY event_type) AS j
        |  FROM sj) t)
        |SELECT kk.k, bb.b, ll.l2,
        |  CAST(CASE WHEN bb.b > 0 AND kk.k > 1 THEN
        |    9 * (kk.k - 1)
        |      * (2 * ll.l2 - bb.b * kk.k * (kk.k + 1) * (kk.k + 1))
        |      * (2 * ll.l2 - bb.b * kk.k * (kk.k + 1) * (kk.k + 1))
        |      * 1000000
        |      // (bb.b * (kk.k * kk.k * kk.k - kk.k)
        |        * (kk.k * kk.k * kk.k - kk.k)) END AS BIGINT)
        |    AS z2_micro,
        |  CASE WHEN bb.b > 0 AND kk.k > 1 THEN
        |    5625 * (kk.k - 1)
        |      * (2 * ll.l2 - bb.b * kk.k * (kk.k + 1) * (kk.k + 1))
        |      * (2 * ll.l2 - bb.b * kk.k * (kk.k + 1) * (kk.k + 1))
        |    > 2401 * bb.b * (kk.k * kk.k * kk.k - kk.k)
        |      * (kk.k * kk.k * kk.k - kk.k) END AS significant,
        |  CASE WHEN 2 * ll.l2 > bb.b * kk.k * (kk.k + 1) * (kk.k + 1)
        |    THEN 'increasing' WHEN 2 * ll.l2 <
        |      bb.b * kk.k * (kk.k + 1) * (kk.k + 1)
        |    THEN 'decreasing' ELSE 'flat' END AS direction
        |FROM kk, bb, ll""".stripMargin) { (s, dir) =>
      val daily = Materialize.stable(events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("x")))
      val kk = daily.agg(countDistinct(col("event_type")).cast("long")
        .as("k"))
      val f = Materialize.stable(daily
        .groupBy(col("day")).agg(count(lit(1)).as("nt"))
        .crossJoin(broadcast(kk))
        .filter(col("nt") === col("k"))
        .select(col("day"))
        .join(daily, Seq("day")))
      val rk = f.as("a")
        .join(f.as("b"), col("a.day") === col("b.day"))
        .groupBy(col("a.day").as("day"),
          col("a.event_type").as("event_type"))
        .agg((lit(2) * sum(when(col("b.x") < col("a.x"), 1)
            .otherwise(0)) +
          sum(when(col("b.x") === col("a.x"), 1).otherwise(0)) + lit(1))
          .cast("long").as("s"))
      val bb = f.agg(countDistinct(col("day")).cast("long").as("b"))
      // L2 = Σ j·S_j over the hypothesized (lexicographic) order: one
      // fold over the sorted k-row array — no window, even a k-row one
      val ll = rk.groupBy(col("event_type"))
        .agg(sum(col("s")).cast("long").as("s_j"))
        .agg(expr("aggregate(" +
          "array_sort(collect_list(struct(event_type, s_j))), " +
          "named_struct('i', 0L, 'tot', 0L), " +
          "(acc, x) -> named_struct('i', acc.i + 1L, " +
          "'tot', acc.tot + (acc.i + 1L) * x.s_j), " +
          "acc -> acc.tot)").as("l2"))
      kk.crossJoin(broadcast(bb)).crossJoin(broadcast(ll))
        .select(col("k"), col("b"), col("l2"),
          expr("CAST(CASE WHEN b > 0 AND k > 1 THEN " +
            "9 * (k - 1) * (2 * l2 - b * k * (k + 1) * (k + 1)) " +
            "* (2 * l2 - b * k * (k + 1) * (k + 1)) * 1000000 div " +
            "(b * (k * k * k - k) * (k * k * k - k)) " +
            "END AS BIGINT)").as("z2_micro"),
          expr("CASE WHEN b > 0 AND k > 1 THEN " +
            "5625 * (k - 1) * (2 * l2 - b * k * (k + 1) * (k + 1)) " +
            "* (2 * l2 - b * k * (k + 1) * (k + 1)) " +
            "> 2401 * b * (k * k * k - k) * (k * k * k - k) END")
            .as("significant"),
          expr("CASE WHEN 2 * l2 > b * k * (k + 1) * (k + 1) " +
            "THEN 'increasing' WHEN 2 * l2 < b * k * (k + 1) * (k + 1) " +
            "THEN 'decreasing' ELSE 'flat' END").as("direction"))
    },

    // Mann–Kendall trend test per series (the standard
    // distribution-free monotone-trend detector, run on the same
    // two-regime frame as the sign/runs tests so the trending
    // cum-user series must fire and the stationary count series must
    // not): S = Σ_{i<j} sgn(x_j − x_i) by pairwise equi-join on the
    // calendar-bounded daily frame (≤ days² pairs per series — never
    // corpus²), the tie-corrected variance as the ×18-scaled integer
    // var18 = n(n−1)(2n+5) − Σt(t−1)(2t+5), and the z > 1.96 verdict
    // as the exact cross-multiplied integer comparison
    // (|S|−1)²·18·625 > 2401·var18 (1.96 = 49/25 exactly) — no sqrt,
    // no float anywhere.
    QuerySpec.sql(
      "stats_mann_kendall",
      s"""WITH $seriesDiffCtes,
         |p AS (
         |  SELECT a.series,
         |    CAST(SUM(CASE WHEN b.x > a.x THEN 1
         |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
         |  FROM daily a JOIN daily b
         |    ON a.series = b.series AND b.day > a.day
         |  GROUP BY 1),
         |nn AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM daily GROUP BY 1),
         |tt AS (SELECT series,
         |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
         |  FROM (SELECT series, x, CAST(COUNT(*) AS BIGINT) AS t
         |    FROM daily GROUP BY 1, 2) g GROUP BY 1)
         |SELECT nn.series, nn.n, COALESCE(p.s, 0) AS s,
         |  CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - tt.tie_term
         |    AS BIGINT) AS var18,
         |  COALESCE(p.s, 0) <> 0 AND
         |    (ABS(COALESCE(p.s, 0)) - 1) * (ABS(COALESCE(p.s, 0)) - 1)
         |      * 11250
         |    > 2401 * (nn.n * (nn.n - 1) * (2 * nn.n + 5) - tt.tie_term)
         |    AS significant,
         |  CASE WHEN COALESCE(p.s, 0) > 0 THEN 'up'
         |    WHEN COALESCE(p.s, 0) < 0 THEN 'down'
         |    ELSE 'flat' END AS trend
         |FROM nn JOIN tt ON tt.series = nn.series
         |LEFT JOIN p ON p.series = nn.series
         |ORDER BY nn.series""".stripMargin) { (s, dir) =>
      val daily = Materialize.stable(seriesDaily(s, dir))
      val p = daily.as("a")
        .join(daily.as("b"), col("a.series") === col("b.series") &&
          col("b.day") > col("a.day"))
        .groupBy(col("a.series").as("series"))
        .agg(sum(when(col("b.x") > col("a.x"), 1L)
          .when(col("b.x") < col("a.x"), -1L).otherwise(0L))
          .cast("long").as("s"))
      val nn = daily.groupBy(col("series"))
        .agg(count(lit(1)).cast("long").as("n"))
      val tt = daily.groupBy(col("series"), col("x"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("series"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .cast("long").as("tie_term"))
      nn.join(tt, Seq("series"))
        .join(p, Seq("series"), "left")
        .select(col("series"), col("n"),
          coalesce(col("s"), lit(0L)).as("s"),
          expr("CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT)")
            .as("var18"))
        .withColumn("significant",
          expr("s <> 0 AND (ABS(s) - 1) * (ABS(s) - 1) * 11250 " +
            "> 2401 * var18"))
        .withColumn("trend", expr("CASE WHEN s > 0 THEN 'up' " +
          "WHEN s < 0 THEN 'down' ELSE 'flat' END"))
        .orderBy(col("series"))
    },

    // Kruskal–Wallis — the k-group rank ANOVA over per-event values
    // (cents-quantized, the established portable rounding): do the
    // event types draw from the same value distribution? Global
    // tie-averaged ranks ride the ×2 histogram identity
    // (2r̄(v) = 2·cum_below + c_v + 1) computed from the
    // range-partitioned PrefixSum over distinct values (no
    // unpartitioned window); H = 3·Σ_g R2_g²/n_g / (n(n+1)) − 3(n+1)
    // with R2_g = Σ 2r̄ per group, each per-group quotient floored
    // identically in both engines (error < 1 against values ~n²);
    // squares and the 10⁶ scaling run in HUGEINT ≡ DECIMAL(38,0)
    // (R2_g² ≈ 4n²n_g² passes 2^63 already at sf0.1). Tie-corrected
    // H' = H·(n³−n)/(n³−n−Σ(t³−t)), NULL when every value ties; the
    // n³ and t³ cubes also ride HUGEINT ≡ DECIMAL(38,0) (n³ passes
    // 2^63 at n ≈ 2.1M — past that the engines would otherwise
    // diverge asymmetrically, DuckDB raising vs Spark wrapping).
    QuerySpec.sql(
      "stats_kruskal_wallis",
      """WITH v AS (
        |  SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT cents, grp, CAST(COUNT(*) AS BIGINT) AS cg
        |  FROM v GROUP BY 1, 2),
        |hv AS (SELECT cents, CAST(SUM(cg) AS BIGINT) AS c
        |  FROM h GROUP BY 1),
        |r AS (SELECT cents, c,
        |    COALESCE(SUM(c) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumb
        |  FROM hv),
        |rg AS (
        |  SELECT h.grp, CAST(SUM(h.cg) AS BIGINT) AS n_g,
        |    CAST(SUM(h.cg * (2 * r.cumb + r.c + 1)) AS BIGINT) AS r2_g
        |  FROM h JOIN r ON r.cents = h.cents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(r2_g AS HUGEINT) * r2_g // n_g) AS HUGEINT)
        |      AS hx
        |  FROM rg),
        |tie AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * c * c - c)
        |    AS HUGEINT) AS tie_num
        |  FROM hv),
        |hh AS (SELECT n, k,
        |    CAST(3 * hx * 1000000 // (n * (n + 1))
        |      - 3 * (n + 1) * 1000000 AS BIGINT) AS h_micro
        |  FROM tot)
        |SELECT hh.n, hh.k, hh.h_micro,
        |  CAST(CASE WHEN CAST(n AS HUGEINT) * n * n - n > tie_num THEN
        |    CAST(h_micro AS HUGEINT) * (CAST(n AS HUGEINT) * n * n - n)
        |      // (CAST(n AS HUGEINT) * n * n - n - tie_num)
        |    END AS BIGINT)
        |    AS h_tie_micro
        |FROM hh, tie""".stripMargin) { (s, dir) =>
      import graft.functions.PrefixSum
      val h = Materialize.stable(events(s, dir)
        .select(col("event_type").as("grp"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("cents"), col("grp"))
        .agg(count(lit(1)).as("cg")))
      val hv = Materialize.stable(h.groupBy(col("cents"))
        .agg(sum(col("cg")).cast("long").as("c")))
      val r = PrefixSum.globalCumsum(hv, Seq(col("cents")), col("c"),
          "cum")
        .withColumn("cumb", col("cum") - col("c"))
      val rg = h.join(r.select(col("cents"), col("c"), col("cumb")),
          Seq("cents"))
        .groupBy(col("grp"))
        .agg(sum(col("cg")).cast("long").as("n_g"),
          sum(col("cg") * (lit(2) * col("cumb") + col("c") + 1))
            .cast("long").as("r2_g"))
      val tot = rg.agg(sum(col("n_g")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k"),
        sum(expr("CAST(r2_g AS DECIMAL(38,0)) * r2_g div n_g"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("hx"))
      val tie = hv.agg(
        sum(expr("CAST(c AS DECIMAL(38,0)) * c * c - c"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("tie_num"))
      tot.crossJoin(broadcast(tie))
        .select(col("n"), col("k"),
          expr("CAST(3 * hx * 1000000 div (n * (n + 1)) " +
            "- 3 * (n + 1) * 1000000 AS BIGINT)").as("h_micro"),
          col("tie_num"))
        .select(col("n"), col("k"), col("h_micro"),
          expr("CAST(CASE WHEN " +
            "CAST(n AS DECIMAL(38,0)) * n * n - n > tie_num THEN " +
            "CAST(h_micro AS DECIMAL(38,0)) " +
            "* (CAST(n AS DECIMAL(38,0)) * n * n - n) div " +
            "(CAST(n AS DECIMAL(38,0)) * n * n - n - tie_num) " +
            "END AS BIGINT)")
            .as("h_tie_micro"))
    },

    // Dunn's post-hoc — WHICH groups differ once Kruskal-Wallis fires:
    // pairwise z tests on the same global tie-averaged ×2 ranks, with
    // the tie-corrected variance and the Bonferroni-adjusted critical
    // value for the k(k−1)/2 comparisons (k = 5 here ⇒ per-pair
    // two-sided α = 0.005, z_crit = Φ⁻¹(0.9975) = 2.807034, so the
    // verdict compares the exact z²_micro against 7879440). Exactness:
    // mean-rank difference floored once to milli units (both terms
    // nonnegative, so // ≡ truncation in both engines), then
    // z² = d²·12(n−1)·n_i·n_j / (10⁶·(n(n+1)(n−1) − Σ(t³−t))·(n_i+n_j))
    // evaluated as a TWO-STEP exact long division
    // (q·10⁶ + r·10⁶//den — the single-shot ×10⁶ product would pass
    // DECIMAL(38,0) at corpus scale). Pair surface: k²/2 rows from a
    // broadcast self-join of the k-row rank-sum table — never data².
    QuerySpec.sql(
      "stats_dunn_posthoc",
      """WITH v AS (
        |  SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT cents, grp, CAST(COUNT(*) AS BIGINT) AS cg
        |  FROM v GROUP BY 1, 2),
        |hv AS (SELECT cents, CAST(SUM(cg) AS BIGINT) AS c
        |  FROM h GROUP BY 1),
        |r AS (SELECT cents, c,
        |    COALESCE(SUM(c) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumb
        |  FROM hv),
        |rg AS (
        |  SELECT h.grp, CAST(SUM(h.cg) AS BIGINT) AS n_g,
        |    CAST(SUM(h.cg * (2 * r.cumb + r.c + 1)) AS BIGINT) AS r2_g
        |  FROM h JOIN r ON r.cents = h.cents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n FROM rg),
        |tie AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * c * c - c)
        |    AS HUGEINT) AS tie_num
        |  FROM hv),
        |pr AS (
        |  SELECT a.grp AS grp_a, b.grp AS grp_b,
        |    a.n_g AS na, b.n_g AS nb,
        |    a.r2_g * 1000 // (2 * a.n_g)
        |      - b.r2_g * 1000 // (2 * b.n_g) AS d_milli
        |  FROM rg a JOIN rg b ON a.grp < b.grp),
        |z AS (
        |  SELECT grp_a, grp_b, na, nb,
        |    CAST(d_milli AS HUGEINT) * d_milli * 12 * (tot.n - 1)
        |      * na * nb AS num,
        |    1000000 * (CAST(tot.n AS HUGEINT) * (tot.n + 1)
        |      * (tot.n - 1) - tie.tie_num) * (na + nb) AS den
        |  FROM pr, tot, tie)
        |SELECT grp_a, grp_b, na AS n_a, nb AS n_b,
        |  CAST(CASE WHEN den > 0 THEN (num // den) * 1000000
        |    + (num % den) * 1000000 // den END AS BIGINT) AS z2_micro,
        |  CASE WHEN den > 0 THEN (num // den) * 1000000
        |    + (num % den) * 1000000 // den > 7879440 END AS significant
        |FROM z ORDER BY grp_a, grp_b""".stripMargin) { (s, dir) =>
      import graft.functions.PrefixSum
      val h = Materialize.stable(events(s, dir)
        .select(col("event_type").as("grp"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("cents"), col("grp"))
        .agg(count(lit(1)).as("cg")))
      val hv = Materialize.stable(h.groupBy(col("cents"))
        .agg(sum(col("cg")).cast("long").as("c")))
      val r = PrefixSum.globalCumsum(hv, Seq(col("cents")), col("c"),
          "cum")
        .withColumn("cumb", col("cum") - col("c"))
      val rg = Materialize.stable(
        h.join(r.select(col("cents"), col("c"), col("cumb")),
            Seq("cents"))
          .groupBy(col("grp"))
          .agg(sum(col("cg")).cast("long").as("n_g"),
            sum(col("cg") * (lit(2) * col("cumb") + col("c") + 1))
              .cast("long").as("r2_g")))
      val tot = rg.agg(sum(col("n_g")).cast("long").as("n"))
      val tie = hv.agg(
        sum(expr("CAST(c AS DECIMAL(38,0)) * c * c - c"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("tie_num"))
      val a = rg.select(col("grp").as("grp_a"), col("n_g").as("na"),
        expr("r2_g * 1000 div (2 * n_g)").as("ra"))
      val b = rg.select(col("grp").as("grp_b"), col("n_g").as("nb"),
        expr("r2_g * 1000 div (2 * n_g)").as("rb"))
      a.join(broadcast(b), col("grp_a") < col("grp_b"))
        .withColumn("d_milli", col("ra") - col("rb"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(tie))
        .select(col("grp_a"), col("grp_b"),
          col("na"), col("nb"),
          expr("CAST(d_milli AS DECIMAL(38,0)) * d_milli * 12 " +
            "* (n - 1) * na * nb").as("num"),
          expr("CAST(1000000 AS DECIMAL(38,0)) " +
            "* (CAST(n AS DECIMAL(38,0)) * (n + 1) * (n - 1) " +
            "- tie_num) * (na + nb)").as("den"))
        .select(col("grp_a"), col("grp_b"),
          col("na").as("n_a"), col("nb").as("n_b"),
          expr("CAST(CASE WHEN den > 0 THEN (num div den) * 1000000 " +
            "+ (num % den) * 1000000 div den END AS BIGINT)")
            .as("z2_micro"),
          expr("CASE WHEN den > 0 THEN (num div den) * 1000000 " +
            "+ (num % den) * 1000000 div den > 7879440 END")
            .as("significant"))
        .orderBy(col("grp_a"), col("grp_b"))
    },

    // Brown–Forsythe (median-based Levene) — variance-homogeneity
    // across the event-type groups, the assumption check ANOVA-style
    // readouts lean on. Everything stays exact integers: group LOWER
    // medians come off the per-group histogram cumsum (2·cum ≥ n_g
    // picks position ⌈n_g/2⌉ — an element selection, portable, no
    // interpolation), the |x−med| moments are plain BIGINT sums, and
    // the F statistic is one integer rational with per-group floors
    // mirrored in both engines: A = Σ(n·Sd_g − n_g·Sd)²//n_g,
    // B = Σ(n_g·Sd2_g − Sd_g²)//n_g (both Cauchy-Schwarz-nonnegative,
    // so floor = truncation in both), F_micro = (n−k)·A·10⁶ //
    // ((k−1)·n²·B). Squares pass 2^63 (n·Sd_g ≈ 5·10¹³ at sf0.1), so
    // the products ride HUGEINT ≡ DECIMAL(38,0); Spark's integral
    // `div` returns LONG, so the per-group floor uses the exact
    // subtract-remainder form ((t − t%n_g)/n_g) instead. Plan: one
    // cents histogram, a per-group (partitioned) cumsum window, two
    // bounded folds.
    QuerySpec.sql(
      "stats_levene_bf",
      """WITH v AS (
        |  SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM v GROUP BY 1, 2),
        |hc AS (SELECT grp, cents, c,
        |    CAST(SUM(c) OVER (PARTITION BY grp ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM h),
        |ng AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_g
        |  FROM h GROUP BY 1),
        |md AS (SELECT hc.grp, MIN(hc.cents) AS med
        |  FROM hc JOIN ng ON ng.grp = hc.grp
        |  WHERE 2 * hc.cum >= ng.n_g GROUP BY 1),
        |st AS (SELECT h.grp, ng.n_g,
        |    CAST(SUM(h.c * ABS(h.cents - md.med)) AS BIGINT) AS sd,
        |    CAST(SUM(h.c * (h.cents - md.med) * (h.cents - md.med))
        |      AS BIGINT) AS sd2
        |  FROM h JOIN md ON md.grp = h.grp JOIN ng ON ng.grp = h.grp
        |  GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS k,
        |  CAST(SUM(sd) AS BIGINT) AS sdall FROM st),
        |ab AS (SELECT
        |    CAST(SUM((CAST(tot.n AS HUGEINT) * st.sd
        |        - st.n_g * tot.sdall)
        |      * (CAST(tot.n AS HUGEINT) * st.sd - st.n_g * tot.sdall)
        |      // st.n_g) AS HUGEINT) AS a_num,
        |    CAST(SUM((CAST(st.n_g AS HUGEINT) * st.sd2
        |        - CAST(st.sd AS HUGEINT) * st.sd)
        |      // st.n_g) AS HUGEINT) AS b_num
        |  FROM st, tot)
        |SELECT tot.n, tot.k,
        |  CAST(a_num // 1000000 AS BIGINT) AS a_scaled,
        |  CAST(b_num AS BIGINT) AS b_num,
        |  CAST(CASE WHEN b_num > 0 AND tot.k > 1 THEN
        |    (tot.n - tot.k) * a_num * 1000000
        |      // ((tot.k - 1) * CAST(tot.n AS HUGEINT) * tot.n * b_num)
        |    END AS BIGINT) AS f_micro
        |FROM tot, ab""".stripMargin) { (s, dir) =>
      val h = Materialize.stable(events(s, dir)
        .select(col("event_type").as("grp"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("grp"), col("cents"))
        .agg(count(lit(1)).cast("long").as("c")))
      val wc = Window.partitionBy(col("grp")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ng = h.groupBy(col("grp"))
        .agg(sum(col("c")).cast("long").as("n_g"))
      val md = h.withColumn("cum", sum(col("c")).over(wc).cast("long"))
        .join(ng, Seq("grp"))
        .filter(lit(2) * col("cum") >= col("n_g"))
        .groupBy(col("grp")).agg(min(col("cents")).as("med"))
      val st = h.join(md, Seq("grp")).join(ng, Seq("grp"))
        .groupBy(col("grp"), col("n_g"))
        .agg(sum(col("c") * abs(col("cents") - col("med")))
            .cast("long").as("sd"),
          sum(col("c") * (col("cents") - col("med")) *
            (col("cents") - col("med"))).cast("long").as("sd2"))
      val stM = Materialize.stable(st)
      val tot = stM.agg(sum(col("n_g")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k"),
        sum(col("sd")).cast("long").as("sdall"))
      val D = org.apache.spark.sql.types.DecimalType(38, 0)
      val ab = stM.crossJoin(broadcast(tot))
        .select(
          expr("CAST(n AS DECIMAL(38,0)) * sd - n_g * sdall").as("x"),
          expr("CAST(n_g AS DECIMAL(38,0)) * sd2 " +
            "- CAST(sd AS DECIMAL(38,0)) * sd").as("y"),
          col("n_g"))
        .select(expr("x * x").as("t"), col("y"), col("n_g"))
        // per-group floor without Spark's long-typed `div`:
        // (t − t % n_g) / n_g is an exact decimal integer
        .select(
          expr("CAST((t - t % n_g) / n_g AS DECIMAL(38,0))").as("a_g"),
          expr("CAST((y - y % n_g) / n_g AS DECIMAL(38,0))").as("b_g"))
        .agg(sum(col("a_g")).cast(D).as("a_num"),
          sum(col("b_g")).cast(D).as("b_num"))
      tot.crossJoin(broadcast(ab))
        .select(col("n"), col("k"),
          expr("CAST(a_num div 1000000 AS BIGINT)").as("a_scaled"),
          expr("CAST(b_num AS BIGINT)").as("b_num"),
          expr("CAST(CASE WHEN b_num > 0 AND k > 1 THEN " +
            "CAST((n - k) AS DECIMAL(38,0)) * a_num * 1000000 div " +
            "((k - 1) * CAST(n AS DECIMAL(38,0)) * n * b_num) " +
            "END AS BIGINT)").as("f_micro"))
    },

    // Two-proportion z-test — the A/B experiment read-out (arm =
    // deterministic user_id parity, conversion = a heavy-purchaser
    // cut that splits every fixture scale non-degenerately). The
    // pooled z² statistic (≡ the 2×2 χ²) is computed as ONE exact
    // integer rational: z² = (c1·n2 − c2·n1)²·n / (n1·n2·c·(n−c)),
    // floored to micro-units in DECIMAL(38,0) ≡ HUGEINT — so a
    // classically-float hypothesis test hash-compares, and the
    // significance verdict (χ²₁ 95% = 3.841459) is decided on the
    // same integer in both engines. Plan: one user_id hash aggregate
    // (the only row-scale pass) + a 4-way conditional fold to a
    // single row. Domain: exact through ~1e6 users/arm (num·10^6
    // < 10^38).
    QuerySpec.sql(
      "stats_ab_ztest",
      """WITH conv AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase')
        |      > 13 THEN 1 ELSE 0 END AS cv
        |  FROM events GROUP BY user_id
        |), agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS BIGINT) AS c2
        |  FROM conv
        |), z AS (
        |  SELECT n1, c1, n2, c2,
        |    CASE WHEN n1 * n2 = 0 OR c1 + c2 = 0
        |        OR n1 + n2 - c1 - c2 = 0 THEN NULL
        |      ELSE CAST(
        |        (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
        |        * (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
        |        * (n1 + n2) * 1000000
        |        // (CAST(n1 AS HUGEINT) * n2 * (c1 + c2)
        |           * (n1 + n2 - c1 - c2)) AS BIGINT) END AS z2_micro
        |  FROM agg)
        |SELECT n1, c1, n2, c2, z2_micro,
        |  z2_micro IS NOT NULL AND z2_micro > 3841459 AS significant
        |FROM z""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("p"))
        .select((col("user_id") % 2).as("arm"),
          when(col("p") > 13, 1L).otherwise(0L).as("cv"))
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("cv")).otherwise(0L)).as("c1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 1, col("cv")).otherwise(0L)).as("c2"))
        .select(col("n1"), col("c1"), col("n2"), col("c2"),
          expr(
            """CASE WHEN n1 * n2 = 0 OR c1 + c2 = 0
              |    OR n1 + n2 - c1 - c2 = 0 THEN NULL
              |  ELSE CAST(
              |    (CAST(c1 AS DECIMAL(19,0)) * n2
              |      - CAST(c2 AS DECIMAL(19,0)) * n1)
              |    * (CAST(c1 AS DECIMAL(19,0)) * n2
              |      - CAST(c2 AS DECIMAL(19,0)) * n1)
              |    * (n1 + n2) * 1000000
              |    div (CAST(n1 AS DECIMAL(19,0)) * n2 * (c1 + c2)
              |      * (n1 + n2 - c1 - c2)) AS BIGINT) END""".stripMargin)
            .as("z2_micro"))
        .select(col("n1"), col("c1"), col("n2"), col("c2"), col("z2_micro"),
          (col("z2_micro").isNotNull && col("z2_micro") > 3841459L)
            .as("significant"))
    },

    // SPRT monitor — the sequential test that makes PEEKING legal
    // (Wald: watch the cumulative log-likelihood ratio day by day;
    // stop the moment it crosses either boundary, error rates intact
    // — the fixed-n tests above are invalid if read daily). H₀:
    // conversion = 40% vs H₁: 50%, α = 0.05, β = 0.2. Everything is
    // exact: the per-observation LLR increments ln(p₁/p₀) and
    // ln(q₁/q₀) are micro-quantized CONSTANTS (one shared literal
    // expression both engines fold identically), so the running LLR
    // is c·lnA + (n−c)·lnB over exact cumulative integer counts, and
    // the Wald boundaries ln((1−β)/α), ln(β/(1−α)) quantize the same
    // way. One pass to daily cohort counts; the cumulative walk is a
    // window over the |days| table.
    QuerySpec.sql(
      "stats_sprt_monitor", {
        def mln(e: String) =
          s"CAST(CAST(ln($e) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        val lnA = mln("0.5 / 0.4")
        val lnB = mln("0.5 / 0.6")
        val up = mln("0.8 / 0.05")
        val lo = mln("0.2 / 0.95")
        s"""WITH u AS (
           |  SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE)
           |      AS day,
           |    CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase')
           |      > 13 THEN 1 ELSE 0 END AS cv
           |  FROM events GROUP BY user_id),
           |d AS (
           |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(cv) AS BIGINT) AS c
           |  FROM u GROUP BY 1),
           |w AS (
           |  SELECT day,
           |    CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS cum_n,
           |    CAST(SUM(c) OVER (ORDER BY day) AS BIGINT) AS cum_c
           |  FROM d),
           |l AS (
           |  SELECT day, cum_n, cum_c,
           |    cum_c * $lnA + (cum_n - cum_c) * $lnB AS llr_micro
           |  FROM w)
           |SELECT day, cum_n AS cum_trials, cum_c AS cum_conversions,
           |  CAST(llr_micro AS BIGINT) AS llr_micro,
           |  CASE WHEN llr_micro >= $up THEN 'reject_h0'
           |    WHEN llr_micro <= $lo THEN 'accept_h0'
           |    ELSE 'continue' END AS decision
           |FROM l ORDER BY day""".stripMargin
      }) { (s, dir) =>
      def mln(e: String) =
        s"CAST(CAST(ln($e) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      val u = events(s, dir)
        .groupBy(col("user_id"))
        .agg(to_date(min(date_trunc("day", col("ts")))).as("day"),
          (sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) > 13).cast("long").as("cv"))
      val d = u.groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("cv")).as("c"))
      // cumulative walk via the range-partitioned two-pass PrefixSum
      // (the house rule: no unpartitioned window, even on the small
      // daily table — the same code then holds at minute grain)
      graft.functions.PrefixSum.globalCumsumMulti(d, Seq(col("day")),
          Seq(col("n") -> "cum_n", col("c") -> "cum_c"))
        .select(col("day"), col("cum_n").cast("long").as("cum_n"),
          col("cum_c").cast("long").as("cum_c"))
        .select(col("day"), col("cum_n").as("cum_trials"),
          col("cum_c").as("cum_conversions"),
          expr(s"CAST(cum_c * ${mln("0.5 / 0.4")} + (cum_n - cum_c) * " +
            s"${mln("0.5 / 0.6")} AS BIGINT)").as("llr_micro"))
        .select(col("day"), col("cum_trials"), col("cum_conversions"),
          col("llr_micro"),
          expr(s"CASE WHEN llr_micro >= ${mln("0.8 / 0.05")} " +
            s"THEN 'reject_h0' WHEN llr_micro <= ${mln("0.2 / 0.95")} " +
            "THEN 'accept_h0' ELSE 'continue' END").as("decision"))
        .orderBy(col("day"))
    },

    // TOST equivalence test — the question ab_ztest can NOT answer:
    // absence of evidence of a difference is not evidence of
    // equivalence; a no-regression launch gate needs BOTH one-sided
    // tests (p₁−p₂ > −δ and < +δ, δ = 5pp, α = 0.05) to reject. Each
    // one-sided z-test is cross-multiplied into one exact 128-bit
    // integer comparison (the ab_ztest discipline; unpooled SE², z²
    // = 2.705686 carried ×10⁶): D± = 20·(c₁n₂ − c₂n₁) ± n₁n₂, reject
    // iff sign(D±) is right AND D±²·n₁n₂·10⁶ > 1082274400·V with V =
    // c₁(n₁−c₁)n₂³ + c₂(n₂−c₂)n₁³ — exact to arm sizes ~3·10⁴ per
    // the HUGEINT/DECIMAL(38,0) headroom (beyond that, arms this
    // query would shard by stratum anyway). Same one keyed aggregate
    // over users as ab_ztest.
    QuerySpec.sql(
      "stats_tost_equivalence",
      """WITH conv AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase')
        |      > 13 THEN 1 ELSE 0 END AS cv
        |  FROM events GROUP BY user_id
        |), agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS BIGINT) AS c2
        |  FROM conv
        |), t AS (
        |  SELECT n1, c1, n2, c2,
        |    20 * (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
        |      + CAST(n1 AS HUGEINT) * n2 AS dlo,
        |    20 * (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
        |      - CAST(n1 AS HUGEINT) * n2 AS dhi,
        |    CAST(c1 AS HUGEINT) * (n1 - c1) * n2 * n2 * n2
        |      + CAST(c2 AS HUGEINT) * (n2 - c2) * n1 * n1 * n1 AS v
        |  FROM agg)
        |SELECT n1, c1, n2, c2,
        |  CAST(dlo AS BIGINT) AS d_lo_x20n, CAST(dhi AS BIGINT) AS d_hi_x20n,
        |  n1 > 0 AND n2 > 0 AND v > 0 AND dlo > 0
        |    AND dlo * dlo * n1 * n2 * 1000000 > 1082274400 * v
        |    AS reject_lo,
        |  n1 > 0 AND n2 > 0 AND v > 0 AND dhi < 0
        |    AND dhi * dhi * n1 * n2 * 1000000 > 1082274400 * v
        |    AS reject_hi,
        |  n1 > 0 AND n2 > 0 AND v > 0 AND dlo > 0 AND dhi < 0
        |    AND dlo * dlo * n1 * n2 * 1000000 > 1082274400 * v
        |    AND dhi * dhi * n1 * n2 * 1000000 > 1082274400 * v
        |    AS equivalent
        |FROM t""".stripMargin) { (s, dir) =>
      val d38 = "DECIMAL(38,0)"
      val agg = events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("p"))
        .select((col("user_id") % 2).as("arm"),
          when(col("p") > 13, 1L).otherwise(0L).as("cv"))
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("cv")).otherwise(0L)).as("c1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 1, col("cv")).otherwise(0L)).as("c2"))
      agg.select(col("n1"), col("c1"), col("n2"), col("c2"),
          expr(s"20 * (CAST(c1 AS $d38) * n2 - CAST(c2 AS $d38) * n1)" +
            s" + CAST(n1 AS $d38) * n2").as("dlo"),
          expr(s"20 * (CAST(c1 AS $d38) * n2 - CAST(c2 AS $d38) * n1)" +
            s" - CAST(n1 AS $d38) * n2").as("dhi"),
          expr(s"CAST(c1 AS $d38) * (n1 - c1) * n2 * n2 * n2" +
            s" + CAST(c2 AS $d38) * (n2 - c2) * n1 * n1 * n1").as("v"))
        .select(col("n1"), col("c1"), col("n2"), col("c2"),
          col("dlo").cast("long").as("d_lo_x20n"),
          col("dhi").cast("long").as("d_hi_x20n"),
          expr("n1 > 0 AND n2 > 0 AND v > 0 AND dlo > 0" +
            " AND dlo * dlo * n1 * n2 * 1000000 > 1082274400 * v")
            .as("reject_lo"),
          expr("n1 > 0 AND n2 > 0 AND v > 0 AND dhi < 0" +
            " AND dhi * dhi * n1 * n2 * 1000000 > 1082274400 * v")
            .as("reject_hi"),
          expr("n1 > 0 AND n2 > 0 AND v > 0 AND dlo > 0 AND dhi < 0" +
            " AND dlo * dlo * n1 * n2 * 1000000 > 1082274400 * v" +
            " AND dhi * dhi * n1 * n2 * 1000000 > 1082274400 * v")
            .as("equivalent"))
    },

    // Eventually-follows relation — process mining's second matrix
    // (events_transitions is the DIRECTLY-follows graph; conformance
    // checking needs both): for each ordered type pair (A, B), how
    // many users have SOME A before SOME B (min_A < max_B), among
    // users exhibiting both types. One hash aggregate to the bounded
    // user×type (min, max) table, a user-keyed self-join with ≤
    // |types| rows per side per user, a |types|²-key aggregate —
    // share exact integer ppm.
    QuerySpec.sql(
      "events_eventually_follows",
      """WITH ut AS (SELECT user_id, event_type,
        |    MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS a_type, b.event_type AS b_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_both,
        |  CAST(SUM(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_follows,
        |  CAST(CAST(SUM(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // COUNT(*) AS BIGINT) AS follows_ppm
        |FROM ut a JOIN ut b ON b.user_id = a.user_id
        |  AND b.event_type <> a.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val ut = events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx"))
      ut.select(col("user_id"), col("event_type").as("a_type"),
          col("mn"))
        .join(ut.select(col("user_id"), col("event_type").as("b_type"),
          col("mx")), Seq("user_id"))
        .filter(col("a_type") =!= col("b_type"))
        .groupBy(col("a_type"), col("b_type"))
        .agg(count(lit(1)).as("n_both"),
          sum(when(col("mn") < col("mx"), 1L).otherwise(0L))
            .as("n_follows"))
        .select(col("a_type"), col("b_type"), col("n_both"),
          col("n_follows"),
          expr("CAST(n_follows * 1000000 div n_both AS BIGINT)")
            .as("follows_ppm"))
        .orderBy(col("a_type"), col("b_type"))
    },

    // Periodogram — the spectral periodicity detector (does this
    // series have a weekly cycle?): DFT power at harmonics k = 1..10
    // of each event-type's daily-count series. Per-term cos/sin are
    // rounded once to 6-decimal integer micros (the ln-gate
    // discipline applied to trig), so Σ x·cos and Σ x·sin are exact
    // long sums, and the power (sc² + ss²) is exact DECIMAL(38,0) ≡
    // HUGEINT scaled back to count² units — a classically-float
    // spectrum that hash-compares. Zero days contribute nothing, so
    // the series needs NO densification; the term table is
    // |days-with-data| × 10, one hash aggregate to |types| × 10 keys.
    QuerySpec.sql(
      "ts_periodogram",
      """WITH d AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT MIN(day) AS d0,
        |    date_diff('day', MIN(day), MAX(day)) + 1 AS n FROM d),
        |tt AS (SELECT event_type, x,
        |    date_diff('day', c.d0, day) AS t, c.n FROM d, c),
        |kk AS (SELECT unnest(range(1, 11)) AS k),
        |terms AS (SELECT event_type, kk.k,
        |    x * CAST(CAST(cos(2 * pi() * kk.k * t / n) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS xc,
        |    x * CAST(CAST(sin(2 * pi() * kk.k * t / n) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT) AS xs
        |  FROM tt, kk),
        |s AS (SELECT event_type, k, CAST(SUM(xc) AS BIGINT) AS sc,
        |    CAST(SUM(xs) AS BIGINT) AS ss
        |  FROM terms GROUP BY 1, 2)
        |SELECT event_type, CAST(k AS BIGINT) AS k,
        |  CAST((CAST(sc AS HUGEINT) * sc + CAST(ss AS HUGEINT) * ss)
        |    // 1000000000000 AS BIGINT) AS power
        |FROM s ORDER BY event_type, k""".stripMargin) { (s, dir) =>
      val d = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val c = d.agg(min(col("day")).as("d0"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("n"))
      d.crossJoin(broadcast(c))
        .select(col("event_type"), col("x"),
          datediff(col("day"), col("d0")).as("t"), col("n"))
        .select(col("event_type"), col("x"), col("t"), col("n"),
          explode(sequence(lit(1), lit(10))).as("k"))
        .select(col("event_type"), col("k"),
          expr("""x * CAST(CAST(cos(2 * pi() * k * t / n) AS DECIMAL(18,6))
                 |  * 1000000 AS BIGINT)""".stripMargin).as("xc"),
          expr("""x * CAST(CAST(sin(2 * pi() * k * t / n) AS DECIMAL(18,6))
                 |  * 1000000 AS BIGINT)""".stripMargin).as("xs"))
        .groupBy(col("event_type"), col("k"))
        .agg(sum(col("xc")).as("sc"), sum(col("xs")).as("ss"))
        .select(col("event_type"), col("k").cast("long").as("k"),
          expr("""CAST((CAST(sc AS DECIMAL(38,0)) * sc
                 |  + CAST(ss AS DECIMAL(38,0)) * ss)
                 |  div 1000000000000 AS BIGINT)""".stripMargin)
            .as("power"))
        .orderBy(col("event_type"), col("k"))
    },

    // Kaplan–Meier survival — time-to-conversion WITH censoring, the
    // estimator product analytics reads when "time to convert" must
    // not ignore users who haven't converted YET (ts_time_to_convert
    // drops them; KM keeps them at risk until the corpus horizon).
    // Duration = first signup → first post-signup purchase (event) or
    // → corpus max time (censored). Plan: the funnel equi-join builds
    // per-user durations (row-scale, uniform user key), ONE hash
    // aggregate to the bounded duration-day grid, and every KM
    // quantity — at-risk suffix sums, d/n hazard, the Π(1−d/n)
    // product as a cumulative SUM of 6-decimal-rounded log terms (the
    // purity/NMI integer-log discipline) — windows over THAT grid,
    // never row-scale data. All outputs integer micros/ppm, so the
    // classically-float survival curve hash-compares. The log term is
    // NULL only when the last risk set dies entirely (S→0).
    QuerySpec.sql(
      "stats_km_survival",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |mx AS (SELECT MAX(us) AS m FROM e),
        |s AS (SELECT user_id, MIN(us) AS s_us FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT s.user_id, MIN(e.us) AS p_us
        |  FROM s JOIN e ON e.user_id = s.user_id
        |    AND e.event_type = 'purchase' AND e.us > s.s_us
        |  GROUP BY 1),
        |u AS (SELECT s.user_id,
        |    CASE WHEN p.p_us IS NOT NULL
        |      THEN (p.p_us - s.s_us) // 86400000000
        |      ELSE (mx.m - s.s_us) // 86400000000 END AS dur,
        |    CASE WHEN p.p_us IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM s LEFT JOIN p ON p.user_id = s.user_id CROSS JOIN mx),
        |g AS (SELECT dur, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(ev) AS BIGINT) AS d
        |  FROM u GROUP BY 1),
        |r AS (SELECT dur, d,
        |    CAST(SUM(c) OVER (ORDER BY dur DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_risk
        |  FROM g),
        |k AS (SELECT dur, n_risk, d,
        |    CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm,
        |    CASE WHEN d < n_risk THEN
        |      CAST(CAST(ln(CAST(n_risk - d AS DOUBLE)
        |        / CAST(n_risk AS DOUBLE)) AS DECIMAL(18,6)) * 1000000
        |        AS BIGINT) END AS term
        |  FROM r WHERE d > 0)
        |SELECT CAST(dur AS BIGINT) AS dur_days, n_risk, d AS n_events,
        |  hazard_ppm,
        |  CASE WHEN term IS NULL THEN NULL ELSE
        |    CAST(SUM(term) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) END AS km_log_micro
        |FROM k ORDER BY dur_days""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val mx = ev.agg(max(col("us")).as("m"))
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
      val p0 = s0.join(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id").as("e_user"), col("us")),
          col("e_user") === col("user_id") && col("us") > col("s_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
      val g = s0.join(p0, Seq("user_id"), "left").crossJoin(broadcast(mx))
        .select(
          expr("""CASE WHEN p_us IS NOT NULL
                 |  THEN (p_us - s_us) div 86400000000
                 |  ELSE (m - s_us) div 86400000000 END""".stripMargin)
            .as("dur"),
          when(col("p_us").isNotNull, 1L).otherwise(0L).as("ev"))
        .groupBy(col("dur"))
        .agg(count(lit(1)).as("c"), sum(col("ev")).as("d"))
      val wRisk = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wKm = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("n_risk", sum(col("c")).over(wRisk))
        .filter(col("d") > 0)
        .select(col("dur"), col("n_risk"), col("d"),
          expr("CAST(d * 1000000 div n_risk AS BIGINT)").as("hazard_ppm"),
          expr("""CASE WHEN d < n_risk THEN
                 |  CAST(CAST(ln(CAST(n_risk - d AS DOUBLE)
                 |    / CAST(n_risk AS DOUBLE)) AS DECIMAL(18,6)) * 1000000
                 |    AS BIGINT) END""".stripMargin).as("term"))
        .withColumn("km_log_micro",
          when(col("term").isNotNull,
            sum(col("term")).over(wKm).cast("long")))
        .select(col("dur").cast("long").as("dur_days"), col("n_risk"),
          col("d").as("n_events"), col("hazard_ppm"), col("km_log_micro"))
        .orderBy(col("dur_days"))
    },

    // Chi-square independence test — the general k×m contingency
    // companion to stats_ab_ztest's 2×2: is event type independent of
    // ISO weekday? ONE row-scale hash aggregate builds the bounded
    // |types|×7 contingency table; marginals come from windows OVER
    // THAT 35-row table, never a rescan. Every cell statistic is
    // exact-integer: expected·10^6 = (r·c·10^6) div n and the cell's
    // χ² contribution (n·O − r·c)²·10^6 div (n·r·c), both in
    // DECIMAL(38,0) ≡ HUGEINT — so the classically-float test
    // hash-compares cell by cell. Domain: exact while n·O < ~10^16
    // (the squared term stays inside 38 digits).
    QuerySpec.sql(
      "stats_chi2_indep",
      """WITH o AS (
        |  SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, dow, obs,
        |    SUM(obs) OVER (PARTITION BY event_type) AS r,
        |    SUM(obs) OVER (PARTITION BY dow) AS c,
        |    SUM(obs) OVER () AS n
        |  FROM o)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow, obs,
        |  CAST(CAST(r AS HUGEINT) * c * 1000000 // n AS BIGINT)
        |    AS expected_micro,
        |  CAST((CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * c)
        |    * (CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * c)
        |    * 1000000 // (CAST(n AS HUGEINT) * r * c) AS BIGINT)
        |    AS chi2_micro
        |FROM m ORDER BY event_type, dow""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = events(s, dir)
        .groupBy(col("event_type"), expr("weekday(ts) + 1").as("dow"))
        .agg(count(lit(1)).as("obs"))
      o
        .withColumn("r", sum(col("obs")).over(Window.partitionBy(col("event_type"))))
        .withColumn("c", sum(col("obs")).over(Window.partitionBy(col("dow"))))
        .withColumn("n", sum(col("obs")).over(Window.partitionBy()))
        .select(col("event_type"), col("dow").cast("long").as("dow"),
          col("obs"),
          expr("CAST(CAST(r AS DECIMAL(38,0)) * c * 1000000 div n AS BIGINT)")
            .as("expected_micro"),
          expr(
            """CAST((CAST(n AS DECIMAL(38,0)) * obs
              |    - CAST(r AS DECIMAL(38,0)) * c)
              |  * (CAST(n AS DECIMAL(38,0)) * obs
              |    - CAST(r AS DECIMAL(38,0)) * c)
              |  * 1000000 div (CAST(n AS DECIMAL(38,0)) * r * c)
              |  AS BIGINT)""".stripMargin).as("chi2_micro"))
        .orderBy(col("event_type"), col("dow"))
    },

    // Robust outlier detection per user: EXACT median + MAD (median
    // absolute deviation) with the 3-MAD rule — the robust-statistics
    // anomaly flagger that, unlike z-scores, one wild value cannot
    // poison. Exactness without any quantile sketch: the median IS an
    // element (or the half-sum of the two middle elements — IEEE +
    // and /2 are exactly rounded, so both engines agree bit-for-bit),
    // picked by rank from a keyed row_number; the deviations rank the
    // same way for the MAD. Three windows and two joins, ALL on the
    // user_id partitioning — nothing global, no sketch error bar.
    QuerySpec.sql(
      "events_mad_outliers",
      """WITH e AS (
        |  SELECT user_id, event_id, value AS v FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |r AS (
        |  SELECT user_id, v,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY v, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |med AS (
        |  SELECT user_id, MAX(n) AS n,
        |    (SUM(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END)
        |     + SUM(CASE WHEN rn = (n + 2) // 2 THEN v ELSE 0 END)) / 2
        |      AS med
        |  FROM r GROUP BY user_id),
        |dr AS (
        |  SELECT user_id, ad, med, n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ad) AS rn
        |  FROM (SELECT e.user_id, ABS(e.v - med.med) AS ad, med.med,
        |          med.n
        |        FROM e JOIN med USING (user_id)) d0),
        |mad AS (
        |  SELECT user_id, MAX(med) AS med, MAX(n) AS n,
        |    (SUM(CASE WHEN rn = (n + 1) // 2 THEN ad ELSE 0 END)
        |     + SUM(CASE WHEN rn = (n + 2) // 2 THEN ad ELSE 0 END)) / 2
        |      AS mad
        |  FROM dr GROUP BY user_id)
        |SELECT e.user_id, CAST(MAX(m.n) AS BIGINT) AS n,
        |  MAX(m.med) AS med, MAX(m.mad) AS mad,
        |  CAST(SUM(CASE WHEN ABS(e.v - m.med) > 3 * m.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM e JOIN mad m USING (user_id)
        |GROUP BY e.user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
        .filter(col("value").isNotNull &&
          col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id"), col("value").as("v"))
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("v"), col("event_id"))
      val wAll = Window.partitionBy(col("user_id"))
      def rankMedian(df: DataFrame, vCol: String) = df
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n"),
          ((sum(when(expr("rn = (n + 1) div 2"), col(vCol))
              .otherwise(lit(0.0)))
            + sum(when(expr("rn = (n + 2) div 2"), col(vCol))
              .otherwise(lit(0.0)))) / 2).as(s"med_$vCol"))
      val med = rankMedian(
        e.withColumn("rn", row_number().over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll)), "v")
        .withColumnRenamed("med_v", "med")
      val wAd = Window.partitionBy(col("user_id")).orderBy(col("ad"))
      val mad = rankMedian(
        e.join(med, Seq("user_id"))
          .select(col("user_id"), abs(col("v") - col("med")).as("ad"),
            col("n"))
          .withColumn("rn", row_number().over(wAd)), "ad")
        .withColumnRenamed("med_ad", "mad")
      e.join(mad, Seq("user_id"))
        .join(med.select(col("user_id"), col("med")), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(max(col("n")).cast("long").as("n"),
          max(col("med")).as("med"), max(col("mad")).as("mad"),
          sum(when(abs(col("v") - col("med")) > lit(3.0) * col("mad"),
            1L).otherwise(0L)).cast("long").as("n_outliers"))
        .orderBy(col("user_id"))
    },

    // SCD-2 interval compression: collapse each user's consecutive
    // same-type event runs into validity intervals
    // [start_us, end_us) — the slowly-changing-dimension build every
    // warehouse runs over a change log (end_us null on the open
    // current segment). The classic islands construction: a lag marks
    // type changes, a running sum numbers the segments, one hash
    // aggregate per (user, segment), and a final lead closes each
    // interval with its successor's start. All three windows share
    // the SINGLE user_id shuffle partitioning (the sessionize
    // argument), and the closing lead runs over the already-collapsed
    // segment table.
    QuerySpec.sql(
      "events_scd2_intervals",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type FROM events),
        |m AS (SELECT user_id, us, event_id, event_type,
        |    CASE WHEN LAG(event_type) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |r AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS seg
        |  FROM m),
        |g AS (SELECT user_id, seg, event_type, MIN(us) AS start_us,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, CAST(seg AS BIGINT) AS seg, event_type,
        |  start_us,
        |  LEAD(start_us) OVER (PARTITION BY user_id ORDER BY seg)
        |    AS end_us,
        |  n_events
        |FROM g ORDER BY user_id, seg""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val g = events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("chg",
          when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")),
            1).otherwise(0))
        .withColumn("seg", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("seg"), col("event_type"))
        .agg(min(col("us")).as("start_us"),
          count(lit(1)).cast("long").as("n_events"))
      g.withColumn("end_us", lead(col("start_us"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("seg"))))
        .select(col("user_id"), col("seg").cast("long").as("seg"),
          col("event_type"), col("start_us"), col("end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("seg"))
    },

    // AS-OF snapshot reconstruction — the time-travel read the SCD-2
    // table exists to serve: each user's state at the corpus midpoint
    // T = (min+max)/2, i.e. the one validity interval containing T
    // (start ≤ T < end, open tail = end NULL). One predicate over the
    // interval table; T is a 1-row broadcast scalar. Together with
    // `events_scd2_intervals` this closes the SCD-2 loop:
    // build → query-at-time.
    QuerySpec.sql(
      "events_scd2_asof",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type FROM events),
        |mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS t FROM e),
        |m AS (SELECT user_id, us, event_id, event_type,
        |    CASE WHEN LAG(event_type) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |r AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS seg
        |  FROM m),
        |g AS (SELECT user_id, seg, event_type, MIN(us) AS start_us,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM r GROUP BY 1, 2, 3),
        |iv AS (SELECT user_id, seg, event_type, start_us,
        |    LEAD(start_us) OVER (PARTITION BY user_id ORDER BY seg)
        |      AS end_us,
        |    n_events
        |  FROM g)
        |SELECT user_id, event_type, start_us, end_us, n_events
        |FROM iv CROSS JOIN mid
        |WHERE start_us <= t AND (end_us IS NULL OR end_us > t)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
      val mid = ev.agg(
        expr("(MIN(us) + MAX(us)) div 2").as("t"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val iv = ev
        .withColumn("chg",
          when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")),
            1).otherwise(0))
        .withColumn("seg", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("seg"), col("event_type"))
        .agg(min(col("us")).as("start_us"),
          count(lit(1)).cast("long").as("n_events"))
        .withColumn("end_us", lead(col("start_us"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("seg"))))
      iv.crossJoin(broadcast(mid))
        .filter(col("start_us") <= col("t") &&
          (col("end_us").isNull || col("end_us") > col("t")))
        .select(col("user_id"), col("event_type"), col("start_us"),
          col("end_us"), col("n_events"))
        .orderBy(col("user_id"))
    },

    // Lo–MacKinlay variance-ratio test per series, q = 2 — does the
    // series behave like a random walk (VR ≈ 1), a momentum/trending
    // process (VR > 1), or a mean-reverting one (VR < 1)? Run on the
    // same two-regime frame as the other trend tests so the trending
    // cum-user series must read momentum and the stationary count
    // series must not. Overlapping 2-period sums y_t = dx_t + dx_{t−1}
    // (the standard overlapping estimator); VR(2) =
    // [n²·(n_y·Σy² − (Σy)²)] / [2·n_y²·(n·Σdx² − (Σdx)²)] — a ratio of
    // two Cauchy–Schwarz-nonnegative integers, so the single ppm floor
    // truncates identically in both engines, and the verdict is the
    // exact num-vs-den comparison (no division at all). Products ride
    // DECIMAL(38,0) ≡ HUGEINT (n·Σy²·n² passes 2^63 once daily deltas
    // reach ~10⁵ over a year). Plan: one series-keyed LAG window over
    // the calendar-bounded daily frame, then BIGINT moment folds.
    QuerySpec.sql(
      "ts_variance_ratio",
      s"""WITH $seriesDiffCtes,
         |r AS (SELECT series, day, dx FROM dd WHERE dx IS NOT NULL),
         |y AS (
         |  SELECT series,
         |    dx + LAG(dx) OVER (PARTITION BY series ORDER BY day)
         |      AS yv
         |  FROM r),
         |s1 AS (
         |  SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(dx) AS BIGINT) AS sx,
         |    CAST(SUM(dx * dx) AS BIGINT) AS sxx
         |  FROM r GROUP BY 1),
         |s2 AS (
         |  SELECT series, CAST(COUNT(*) AS BIGINT) AS ny,
         |    CAST(SUM(yv) AS BIGINT) AS sy,
         |    CAST(SUM(yv * yv) AS BIGINT) AS syy
         |  FROM y WHERE yv IS NOT NULL GROUP BY 1),
         |v AS (
         |  SELECT s1.series, s1.n, COALESCE(s2.ny, 0) AS ny,
         |    CAST((COALESCE(s2.ny, 0) * CAST(COALESCE(s2.syy, 0)
         |        AS HUGEINT) - CAST(COALESCE(s2.sy, 0) AS HUGEINT)
         |        * COALESCE(s2.sy, 0)) * s1.n * s1.n AS HUGEINT)
         |      AS num,
         |    CAST(2 * (s1.n * CAST(s1.sxx AS HUGEINT)
         |        - CAST(s1.sx AS HUGEINT) * s1.sx)
         |      * COALESCE(s2.ny, 0) * COALESCE(s2.ny, 0) AS HUGEINT)
         |      AS den
         |  FROM s1 LEFT JOIN s2 ON s2.series = s1.series)
         |SELECT series, n AS n_returns, ny AS n_sums,
         |  CAST(CASE WHEN den > 0 THEN num * 1000000 // den END
         |    AS BIGINT) AS vr2_ppm,
         |  CASE WHEN den = 0 THEN NULL
         |    WHEN num > den THEN 'momentum'
         |    WHEN num < den THEN 'mean_reverting'
         |    ELSE 'random_walk' END AS verdict
         |FROM v ORDER BY series""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("series")).orderBy(col("day"))
      val r = Materialize.stable(seriesDiffs(s, dir)
        .filter(col("dx").isNotNull))
      val s1 = r.groupBy(col("series"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("dx")).cast("long").as("sx"),
          sum(col("dx") * col("dx")).cast("long").as("sxx"))
      val s2 = r
        .withColumn("yv", col("dx") + lag(col("dx"), 1).over(w))
        .filter(col("yv").isNotNull)
        .groupBy(col("series"))
        .agg(count(lit(1)).cast("long").as("ny"),
          sum(col("yv")).cast("long").as("sy"),
          sum(col("yv") * col("yv")).cast("long").as("syy"))
      s1.join(s2, Seq("series"), "left")
        .select(col("series"), col("n"),
          coalesce(col("ny"), lit(0L)).as("ny"),
          expr("CAST((COALESCE(ny, 0) * CAST(COALESCE(syy, 0) " +
            "AS DECIMAL(38,0)) - CAST(COALESCE(sy, 0) " +
            "AS DECIMAL(38,0)) * COALESCE(sy, 0)) * n * n " +
            "AS DECIMAL(38,0))").as("num"),
          expr("CAST(2 * (n * CAST(sxx AS DECIMAL(38,0)) " +
            "- CAST(sx AS DECIMAL(38,0)) * sx) " +
            "* COALESCE(ny, 0) * COALESCE(ny, 0) AS DECIMAL(38,0))")
            .as("den"))
        .select(col("series"), col("n").as("n_returns"),
          col("ny").as("n_sums"),
          expr("CAST(CASE WHEN den > 0 THEN num * 1000000 div den " +
            "END AS BIGINT)").as("vr2_ppm"),
          expr("CASE WHEN den = 0 THEN NULL " +
            "WHEN num > den THEN 'momentum' " +
            "WHEN num < den THEN 'mean_reverting' " +
            "ELSE 'random_walk' END").as("verdict"))
        .orderBy(col("series"))
    },

    // Turning-points randomness test per series — counts strict local
    // maxima/minima in the daily frame and compares against the
    // exact null moments E[T] = 2(n−2)/3, Var[T] = (16n−29)/90:
    // a jagged series (noise) turns more often than a random walk,
    // a smooth trending one less. With d = 3T − 2(n−2) the statistic
    // z² = 10·d²/(16n−29) and the z > 1.96 verdict is the exact
    // cross-multiplied comparison 6250·d² > 2401·(16n−29)
    // (1.96 = 49/25) — no float anywhere; equal-value neighbors
    // (possible under count data) are NOT turning points (strict
    // inequalities both sides), the same convention both engines
    // compile from this text. Plan: one series-keyed LAG/LEAD window
    // over the calendar-bounded daily frame, then one fold.
    QuerySpec.sql(
      "ts_turning_points",
      s"""WITH $seriesDiffCtes,
         |t AS (
         |  SELECT series, x,
         |    LAG(x) OVER (PARTITION BY series ORDER BY day) AS pv,
         |    LEAD(x) OVER (PARTITION BY series ORDER BY day) AS nx
         |  FROM daily),
         |a AS (
         |  SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(COALESCE(SUM(CASE WHEN pv IS NOT NULL
         |      AND nx IS NOT NULL AND ((x > pv AND x > nx)
         |        OR (x < pv AND x < nx)) THEN 1 END), 0) AS BIGINT)
         |      AS tp
         |  FROM t GROUP BY 1),
         |d AS (SELECT series, n, tp, 3 * tp - 2 * (n - 2) AS dz
         |  FROM a)
         |SELECT series, n AS n_days, tp AS n_turns,
         |  CAST(CASE WHEN n >= 3 THEN
         |    10 * dz * dz * 1000000 // (16 * n - 29) END AS BIGINT)
         |    AS z2_micro,
         |  CASE WHEN n >= 3 THEN
         |    6250 * dz * dz > 2401 * (16 * n - 29) END AS significant,
         |  CASE WHEN n < 3 THEN NULL WHEN dz > 0 THEN 'jagged'
         |    WHEN dz < 0 THEN 'smooth' ELSE 'random' END AS verdict
         |FROM d ORDER BY series""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("series")).orderBy(col("day"))
      seriesDaily(s, dir)
        .select(col("series"), col("x"),
          lag(col("x"), 1).over(w).as("pv"),
          lead(col("x"), 1).over(w).as("nx"))
        .groupBy(col("series"))
        .agg(count(lit(1)).cast("long").as("n"),
          coalesce(sum(when(col("pv").isNotNull &&
              col("nx").isNotNull &&
              ((col("x") > col("pv") && col("x") > col("nx")) ||
               (col("x") < col("pv") && col("x") < col("nx"))), 1L)),
            lit(0L)).cast("long").as("tp"))
        .withColumn("dz", expr("3 * tp - 2 * (n - 2)"))
        .select(col("series"), col("n").as("n_days"),
          col("tp").as("n_turns"),
          expr("CAST(CASE WHEN n >= 3 THEN " +
            "10 * dz * dz * 1000000 div (16 * n - 29) END AS BIGINT)")
            .as("z2_micro"),
          expr("CASE WHEN n >= 3 THEN " +
            "6250 * dz * dz > 2401 * (16 * n - 29) END")
            .as("significant"),
          expr("CASE WHEN n < 3 THEN NULL WHEN dz > 0 THEN 'jagged' " +
            "WHEN dz < 0 THEN 'smooth' ELSE 'random' END")
            .as("verdict"))
        .orderBy(col("series"))
    },

    // Maximum drawdown per event-type value series — the worst
    // peak-to-trough decline of the daily total (exact cents), the
    // risk summary every monitored business metric carries. Running
    // peak via a series-keyed cumulative-max window; the trough is
    // the EARLIEST day attaining the maximal drawdown (min_by on the
    // unique daily grain — deterministic in both engines), and the
    // relative depth is one nonnegative ppm floor against the peak
    // at that trough. Plan: one daily aggregate, one keyed window,
    // one k-row join-back — nothing global, no sort beyond the
    // per-series window.
    QuerySpec.sql(
      "ts_max_drawdown",
      """WITH d AS (
        |  SELECT event_type AS series,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS x
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT series, day, x,
        |    MAX(x) OVER (PARTITION BY series ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM d),
        |dd AS (SELECT series, day, peak, peak - x AS draw FROM p),
        |m AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(MAX(draw) AS BIGINT) AS max_dd
        |  FROM dd GROUP BY 1)
        |SELECT m.series, m.n_days,
        |  arg_min(dd.peak, dd.day) AS peak_cents,
        |  m.max_dd AS max_drawdown_cents,
        |  MIN(dd.day) AS trough_day,
        |  CAST(CASE WHEN arg_min(dd.peak, dd.day) > 0 THEN
        |    m.max_dd * 1000000 // arg_min(dd.peak, dd.day) END
        |    AS BIGINT) AS drawdown_ppm
        |FROM m JOIN dd ON dd.series = m.series AND dd.draw = m.max_dd
        |GROUP BY m.series, m.n_days, m.max_dd
        |ORDER BY m.series""".stripMargin) { (s, dir) =>
      val d = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))
          .cast("long").as("x"))
      val w = Window.partitionBy(col("series")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = Materialize.stable(d
        .withColumn("peak", max(col("x")).over(w))
        .select(col("series"), col("day"), col("peak"),
          (col("peak") - col("x")).as("draw")))
      val m = dd.groupBy(col("series"))
        .agg(count(lit(1)).cast("long").as("n_days"),
          max(col("draw")).cast("long").as("max_dd"))
      m.join(dd, Seq("series"))
        .filter(col("draw") === col("max_dd"))
        .groupBy(col("series"), col("n_days"), col("max_dd"))
        .agg(min_by(col("peak"), col("day")).as("peak_cents"),
          min(col("day")).as("trough_day"))
        .select(col("series"), col("n_days"), col("peak_cents"),
          col("max_dd").as("max_drawdown_cents"), col("trough_day"),
          expr("CAST(CASE WHEN peak_cents > 0 THEN " +
            "max_dd * 1000000 div peak_cents END AS BIGINT)")
            .as("drawdown_ppm"))
        .orderBy(col("series"))
    },

    // Seasonal Mann–Kendall (Hirsch–Slack) per series — the trend
    // test a weekly-cycled metric actually needs: Kendall's S is
    // computed WITHIN each day-of-week season (so the weekend dip
    // never masquerades as trend), then S and the ×18-scaled
    // tie-corrected variances sum across seasons (independent under
    // the null). Verdict is the same exact cross-multiplied
    // (|S|−1)²·11250 > 2401·var18 as the plain MK gate. Pair surface:
    // day²/7 per series (calendar-bounded), never corpus².
    QuerySpec.sql(
      "stats_seasonal_mk",
      s"""WITH $seriesDiffCtes,
         |sd AS (SELECT series, day, isodow(day) AS dow, x FROM daily),
         |p AS (
         |  SELECT a.series, a.dow,
         |    CAST(SUM(CASE WHEN b.x > a.x THEN 1
         |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
         |  FROM sd a JOIN sd b
         |    ON a.series = b.series AND a.dow = b.dow AND b.day > a.day
         |  GROUP BY 1, 2),
         |nn AS (SELECT series, dow, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sd GROUP BY 1, 2),
         |tt AS (SELECT series, dow,
         |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
         |  FROM (SELECT series, dow, x, CAST(COUNT(*) AS BIGINT) AS t
         |    FROM sd GROUP BY 1, 2, 3) g GROUP BY 1, 2),
         |agg AS (
         |  SELECT nn.series, CAST(SUM(nn.n) AS BIGINT) AS n,
         |    CAST(SUM(COALESCE(p.s, 0)) AS BIGINT) AS s,
         |    CAST(SUM(nn.n * (nn.n - 1) * (2 * nn.n + 5)
         |      - tt.tie_term) AS BIGINT) AS var18
         |  FROM nn JOIN tt ON tt.series = nn.series AND tt.dow = nn.dow
         |  LEFT JOIN p ON p.series = nn.series AND p.dow = nn.dow
         |  GROUP BY 1)
         |SELECT series, n, s, var18,
         |  s <> 0 AND (ABS(s) - 1) * (ABS(s) - 1) * 11250
         |    > 2401 * var18 AS significant,
         |  CASE WHEN s > 0 THEN 'up' WHEN s < 0 THEN 'down'
         |    ELSE 'flat' END AS trend
         |FROM agg ORDER BY series""".stripMargin) { (s, dir) =>
      val sd = Materialize.stable(seriesDaily(s, dir)
        .withColumn("dow", expr("weekday(day) + 1")))
      val p = sd.as("a")
        .join(sd.as("b"), col("a.series") === col("b.series") &&
          col("a.dow") === col("b.dow") && col("b.day") > col("a.day"))
        .groupBy(col("a.series").as("series"), col("a.dow").as("dow"))
        .agg(sum(when(col("b.x") > col("a.x"), 1L)
          .when(col("b.x") < col("a.x"), -1L).otherwise(0L))
          .cast("long").as("s"))
      val nn = sd.groupBy(col("series"), col("dow"))
        .agg(count(lit(1)).cast("long").as("n"))
      val tt = sd.groupBy(col("series"), col("dow"), col("x"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("series"), col("dow"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .cast("long").as("tie_term"))
      nn.join(tt, Seq("series", "dow"))
        .join(p, Seq("series", "dow"), "left")
        .groupBy(col("series"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(coalesce(col("s"), lit(0L))).cast("long").as("s"),
          sum(col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
            - col("tie_term")).cast("long").as("var18"))
        .select(col("series"), col("n"), col("s"), col("var18"),
          expr("s <> 0 AND (ABS(s) - 1) * (ABS(s) - 1) * 11250 " +
            "> 2401 * var18").as("significant"),
          expr("CASE WHEN s > 0 THEN 'up' WHEN s < 0 THEN 'down' " +
            "ELSE 'flat' END").as("trend"))
        .orderBy(col("series"))
    },

    // Jonckheere–Terpstra — the ordered-alternative k-group test
    // (do values RISE across the hypothesized group ordering?), the
    // independent-samples sibling of Page's trend test, over the same
    // lexicographic event-type ordering. JT = Σ_{i<j} U_ij computed
    // ×2 on cents histograms (2U = 2·#less + #ties): each group's
    // strictly-below cumulative lives on the GLOBAL distinct-value
    // grid (k×V rows, windows keyed by group), so the pair sum is an
    // equi-join on cents — no value×value surface anywhere. The null
    // moments are exact integers (E2 = 2E = (n²−Σn_g²)/2 — always
    // even as Σ_{i≠j}n_i n_j; Var = D/72 with D = n²(2n+3) −
    // Σn_g²(2n_g+3)), so z² = 18·d²/D with d = JT2−E2, and the
    // z > 1.96 verdict is the exact 11250·d² > 2401·D comparison.
    // Ties enter JT exactly (the ½ convention ×2); the variance uses
    // the untied form (cents ties are quantization artifacts — the
    // convention both engines compile from this text). d² rides
    // DECIMAL(38,0) ≡ HUGEINT (JT2 ≈ n² passes 2^63 at n ≈ 3B, d²
    // far earlier).
    QuerySpec.sql(
      "stats_jonckheere",
      """WITH v AS (
        |  SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS cg
        |  FROM v GROUP BY 1, 2),
        |hv AS (SELECT DISTINCT cents FROM h),
        |gs AS (SELECT DISTINCT grp FROM h),
        |grid AS (
        |  SELECT gs.grp, hv.cents, COALESCE(h.cg, 0) AS cg0,
        |    COALESCE(SUM(h.cg) OVER (PARTITION BY gs.grp
        |      ORDER BY hv.cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumb
        |  FROM hv CROSS JOIN gs
        |  LEFT JOIN h ON h.grp = gs.grp AND h.cents = hv.cents),
        |jt AS (
        |  SELECT CAST(SUM(b.cg * (2 * a.cumb + a.cg0)) AS BIGINT)
        |    AS jt2
        |  FROM h b JOIN grid a ON a.cents = b.cents
        |  WHERE a.grp < b.grp),
        |ng AS (SELECT grp, CAST(SUM(cg) AS BIGINT) AS n_g
        |  FROM h GROUP BY 1),
        |mo AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST((SUM(n_g) * SUM(n_g) - SUM(n_g * n_g)) // 2
        |      AS BIGINT) AS e2,
        |    CAST(SUM(n_g) * SUM(n_g) * (2 * SUM(n_g) + 3)
        |      - SUM(n_g * n_g * (2 * n_g + 3)) AS BIGINT) AS d72
        |  FROM ng)
        |SELECT mo.n, mo.k, jt.jt2, mo.e2,
        |  CAST(CASE WHEN mo.d72 > 0 THEN
        |    18 * CAST(jt.jt2 - mo.e2 AS HUGEINT) * (jt.jt2 - mo.e2)
        |      * 1000000 // mo.d72 END AS BIGINT) AS z2_micro,
        |  CASE WHEN mo.d72 > 0 THEN
        |    11250 * CAST(jt.jt2 - mo.e2 AS HUGEINT) * (jt.jt2 - mo.e2)
        |      > 2401 * CAST(mo.d72 AS HUGEINT) END AS significant,
        |  CASE WHEN jt.jt2 > mo.e2 THEN 'increasing'
        |    WHEN jt.jt2 < mo.e2 THEN 'decreasing'
        |    ELSE 'none' END AS direction
        |FROM mo, jt""".stripMargin) { (s, dir) =>
      val h = Materialize.stable(events(s, dir)
        .select(col("event_type").as("grp"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("grp"), col("cents"))
        .agg(count(lit(1)).cast("long").as("cg")))
      val hv = h.select(col("cents")).distinct()
      val gs = h.select(col("grp")).distinct()
      val wg = Window.partitionBy(col("grp")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val grid = hv.crossJoin(broadcast(gs))
        .join(h, Seq("grp", "cents"), "left")
        .select(col("grp"), col("cents"),
          coalesce(col("cg"), lit(0L)).as("cg0"),
          coalesce(sum(col("cg")).over(wg), lit(0L)).as("cumb"))
      val jt = h.as("b")
        .join(grid.as("a"), col("a.cents") === col("b.cents") &&
          col("a.grp") < col("b.grp"))
        .agg(sum(col("b.cg") * (lit(2) * col("a.cumb") + col("a.cg0")))
          .cast("long").as("jt2"))
      val mo = h.groupBy(col("grp"))
        .agg(sum(col("cg")).cast("long").as("n_g"))
        .agg(sum(col("n_g")).cast("long").as("n"),
          count(lit(1)).cast("long").as("k"),
          expr("CAST((SUM(n_g) * SUM(n_g) - SUM(n_g * n_g)) div 2 " +
            "AS BIGINT)").as("e2"),
          expr("CAST(SUM(n_g) * SUM(n_g) * (2 * SUM(n_g) + 3) " +
            "- SUM(n_g * n_g * (2 * n_g + 3)) AS BIGINT)").as("d72"))
      mo.crossJoin(broadcast(jt))
        .select(col("n"), col("k"), col("jt2"), col("e2"),
          expr("CAST(CASE WHEN d72 > 0 THEN " +
            "18 * CAST(jt2 - e2 AS DECIMAL(38,0)) * (jt2 - e2) " +
            "* 1000000 div d72 END AS BIGINT)").as("z2_micro"),
          expr("CASE WHEN d72 > 0 THEN " +
            "11250 * CAST(jt2 - e2 AS DECIMAL(38,0)) * (jt2 - e2) " +
            "> 2401 * CAST(d72 AS DECIMAL(38,0)) END")
            .as("significant"),
          expr("CASE WHEN jt2 > e2 THEN 'increasing' " +
            "WHEN jt2 < e2 THEN 'decreasing' ELSE 'none' END")
            .as("direction"))
    },

    // Mood's median test — the blunt-but-robust k-group location
    // test: classify every value against the EXACT global lower
    // median (an element, selected by rank from the PrefixSum
    // cumulative over the cents histogram — no sketch, no
    // unpartitioned window), then chi-square the k×2
    // above/not-above contingency. Each group row carries its two
    // cell contributions as exact micro floors ((n·obs − n_g·A)² is
    // nonnegative, so // ≡ truncation in both engines); squared
    // products ride DECIMAL(38,0) ≡ HUGEINT (n·a_g ≈ n² passes 2^63
    // at n ≈ 3B).
    QuerySpec.sql(
      "stats_mood_median",
      """WITH v AS (
        |  SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS cg
        |  FROM v GROUP BY 1, 2),
        |hv AS (SELECT cents, CAST(SUM(cg) AS BIGINT) AS c
        |  FROM h GROUP BY 1),
        |r AS (SELECT cents, c,
        |    SUM(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
        |      AS cum
        |  FROM hv),
        |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hv),
        |med AS (
        |  SELECT MIN(cents) AS med FROM r, nn
        |  WHERE cum >= (n + 1) // 2),
        |g AS (
        |  SELECT h.grp, CAST(SUM(h.cg) AS BIGINT) AS n_g,
        |    CAST(SUM(CASE WHEN h.cents > med.med THEN h.cg
        |      ELSE 0 END) AS BIGINT) AS a_g
        |  FROM h, med GROUP BY 1),
        |tot AS (SELECT CAST(SUM(a_g) AS BIGINT) AS a FROM g)
        |SELECT g.grp, g.n_g, g.a_g AS n_above,
        |  g.n_g - g.a_g AS n_not_above,
        |  CAST(g.n_g * tot.a * 1000000 // nn.n AS BIGINT)
        |    AS expected_above_micro,
        |  CAST(CASE WHEN tot.a > 0 AND tot.a < nn.n THEN
        |    CAST(nn.n * g.a_g - g.n_g * tot.a AS HUGEINT)
        |      * (nn.n * g.a_g - g.n_g * tot.a) * 1000000
        |      // (CAST(nn.n AS HUGEINT) * g.n_g * tot.a)
        |    + CAST(nn.n * (g.n_g - g.a_g) - g.n_g * (nn.n - tot.a)
        |        AS HUGEINT)
        |      * (nn.n * (g.n_g - g.a_g) - g.n_g * (nn.n - tot.a))
        |      * 1000000
        |      // (CAST(nn.n AS HUGEINT) * g.n_g * (nn.n - tot.a))
        |    END AS BIGINT) AS chi2_cell_micro
        |FROM g, tot, nn ORDER BY g.grp""".stripMargin) { (s, dir) =>
      import graft.functions.PrefixSum
      val h = Materialize.stable(events(s, dir)
        .select(col("event_type").as("grp"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("grp"), col("cents"))
        .agg(count(lit(1)).cast("long").as("cg")))
      val hv = h.groupBy(col("cents"))
        .agg(sum(col("cg")).cast("long").as("c"))
      val r = PrefixSum.globalCumsum(hv, Seq(col("cents")), col("c"),
        "cum")
      val nn = hv.agg(sum(col("c")).cast("long").as("n"))
      val med = r.crossJoin(broadcast(nn))
        .filter(expr("cum >= (n + 1) div 2"))
        .agg(min(col("cents")).as("med"))
      val g = h.crossJoin(broadcast(med))
        .groupBy(col("grp"))
        .agg(sum(col("cg")).cast("long").as("n_g"),
          sum(when(col("cents") > col("med"), col("cg"))
            .otherwise(0L)).cast("long").as("a_g"))
      val tot = g.agg(sum(col("a_g")).cast("long").as("a"))
      g.crossJoin(broadcast(tot)).crossJoin(broadcast(nn))
        .select(col("grp"), col("n_g"), col("a_g").as("n_above"),
          (col("n_g") - col("a_g")).as("n_not_above"),
          expr("CAST(n_g * a * 1000000 div n AS BIGINT)")
            .as("expected_above_micro"),
          expr("CAST(CASE WHEN a > 0 AND a < n THEN " +
            "CAST(n * a_g - n_g * a AS DECIMAL(38,0)) " +
            "* (n * a_g - n_g * a) * 1000000 " +
            "div (CAST(n AS DECIMAL(38,0)) * n_g * a) " +
            "+ CAST(n * (n_g - a_g) - n_g * (n - a) AS DECIMAL(38,0)) " +
            "* (n * (n_g - a_g) - n_g * (n - a)) * 1000000 " +
            "div (CAST(n AS DECIMAL(38,0)) * n_g * (n - a)) " +
            "END AS BIGINT)").as("chi2_cell_micro"))
        .orderBy(col("grp"))
    },

    // Cramér's V — the EFFECT-SIZE companion the chi2_indep gate
    // owes its readers (a p-value says "dependent"; V says "how
    // much"): V² = χ²/(n·min(r−1, c−1)) over the same
    // event-type × day-of-week contingency, with χ²_micro summed
    // from the identical per-cell floors the chi2_indep gate emits
    // (flooring per cell THEN summing — the convention both engines
    // compile from this text). One row; every product rides
    // DECIMAL(38,0) ≡ HUGEINT.
    QuerySpec.sql(
      "stats_cramers_v",
      """WITH o AS (
        |  SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, dow, obs,
        |    SUM(obs) OVER (PARTITION BY event_type) AS r,
        |    SUM(obs) OVER (PARTITION BY dow) AS c,
        |    SUM(obs) OVER () AS n
        |  FROM o),
        |cc AS (
        |  SELECT MAX(n) AS n,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
        |    CAST(COUNT(DISTINCT dow) AS BIGINT) AS nc,
        |    CAST(SUM((CAST(n AS HUGEINT) * obs
        |        - CAST(r AS HUGEINT) * c)
        |      * (CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * c)
        |      * 1000000 // (CAST(n AS HUGEINT) * r * c)) AS HUGEINT)
        |      AS chi2_micro
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n, nr, nc,
        |  (nr - 1) * (nc - 1) AS dof,
        |  CAST(chi2_micro AS BIGINT) AS chi2_micro,
        |  CAST(chi2_micro // n AS BIGINT) AS phi2_ppm,
        |  CAST(chi2_micro // (n * LEAST(nr - 1, nc - 1)) AS BIGINT)
        |    AS v2_ppm
        |FROM cc""".stripMargin) { (s, dir) =>
      val o = events(s, dir)
        .groupBy(col("event_type"), expr("weekday(ts) + 1").as("dow"))
        .agg(count(lit(1)).as("obs"))
      o
        .withColumn("r",
          sum(col("obs")).over(Window.partitionBy(col("event_type"))))
        .withColumn("c",
          sum(col("obs")).over(Window.partitionBy(col("dow"))))
        .withColumn("n", sum(col("obs")).over(Window.partitionBy()))
        .agg(max(col("n")).cast("long").as("n"),
          countDistinct(col("event_type")).cast("long").as("nr"),
          countDistinct(col("dow")).cast("long").as("nc"),
          sum(expr(
            """(CAST(n AS DECIMAL(38,0)) * obs
              |  - CAST(r AS DECIMAL(38,0)) * c)
              |* (CAST(n AS DECIMAL(38,0)) * obs
              |  - CAST(r AS DECIMAL(38,0)) * c)
              |* 1000000 div (CAST(n AS DECIMAL(38,0)) * r * c)"""
              .stripMargin))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .as("chi2_micro"))
        .select(col("n"), col("nr"), col("nc"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          col("chi2_micro").cast("long").as("chi2_micro"),
          expr("CAST(chi2_micro div n AS BIGINT)").as("phi2_ppm"),
          expr("CAST(chi2_micro div (n * LEAST(nr - 1, nc - 1)) " +
            "AS BIGINT)").as("v2_ppm"))
    },

    // Cliff's delta — the ordinal effect size between the click and
    // view value distributions: δ = (#(a>b) − #(a<b))/(n_a·n_b),
    // the number Mann–Whitney's p-value doesn't give. The dominance
    // count folds over the two cents histograms through ONE
    // PrefixSum cumulative on the shared distinct-value grid
    // (#greater − #less = Σ_v c_a(v)·(2·cumb_b(v) + c_b(v) − n_b)) —
    // an equi-join on cents, never a value×value surface. The
    // signed ppm is sign·(|num|·10⁶ // n_a·n_b) — the floor runs on
    // the nonnegative magnitude so // ≡ div exactly — and the
    // standard effect buckets (0.147/0.33/0.474) are exact
    // cross-multiplied integer comparisons.
    QuerySpec.sql(
      "stats_cliffs_delta",
      """WITH va AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'click'),
        |vb AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'view'),
        |ha AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS ca
        |  FROM va GROUP BY 1),
        |hb AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM vb GROUP BY 1),
        |grid AS (
        |  SELECT g.cents, COALESCE(hb.cb, 0) AS cb0,
        |    COALESCE(SUM(hb.cb) OVER (ORDER BY g.cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumb
        |  FROM (SELECT cents FROM ha UNION SELECT cents FROM hb) g
        |  LEFT JOIN hb ON hb.cents = g.cents),
        |nb AS (SELECT CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS n_b
        |  FROM hb),
        |na AS (SELECT CAST(COALESCE(SUM(ca), 0) AS BIGINT) AS n_a
        |  FROM ha),
        |dm AS (
        |  SELECT CAST(SUM(ha.ca * (2 * grid.cumb + grid.cb0 - nb.n_b))
        |    AS BIGINT) AS num
        |  FROM ha JOIN grid ON grid.cents = ha.cents, nb)
        |SELECT na.n_a, nb.n_b, dm.num AS dominance,
        |  CAST(CASE WHEN dm.num >= 0 THEN
        |      ABS(dm.num) * 1000000 // (na.n_a * nb.n_b)
        |    ELSE -(ABS(dm.num) * 1000000 // (na.n_a * nb.n_b)) END
        |    AS BIGINT) AS delta_ppm,
        |  CASE WHEN ABS(dm.num) * 1000 < 147 * na.n_a * nb.n_b
        |      THEN 'negligible'
        |    WHEN ABS(dm.num) * 100 < 33 * na.n_a * nb.n_b
        |      THEN 'small'
        |    WHEN ABS(dm.num) * 1000 < 474 * na.n_a * nb.n_b
        |      THEN 'medium'
        |    ELSE 'large' END AS effect
        |FROM na, nb, dm""".stripMargin) { (s, dir) =>
      import graft.functions.PrefixSum
      val v = Materialize.stable(events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents")))
      val ha = v.filter(col("event_type") === "click")
        .groupBy(col("cents")).agg(count(lit(1)).cast("long").as("ca"))
      val hb = v.filter(col("event_type") === "view")
        .groupBy(col("cents")).agg(count(lit(1)).cast("long").as("cb"))
      val g0 = ha.select(col("cents"))
        .union(hb.select(col("cents"))).distinct()
        .join(hb, Seq("cents"), "left")
        .select(col("cents"), coalesce(col("cb"), lit(0L)).as("cb0"))
      val grid = PrefixSum.globalCumsum(g0, Seq(col("cents")),
          col("cb0"), "cum")
        .withColumn("cumb", col("cum") - col("cb0"))
      val na = ha.agg(coalesce(sum(col("ca")), lit(0L)).cast("long")
        .as("n_a"))
      val nb = hb.agg(coalesce(sum(col("cb")), lit(0L)).cast("long")
        .as("n_b"))
      val dm = ha.join(grid, Seq("cents"))
        .crossJoin(broadcast(nb))
        .agg(sum(col("ca") * (lit(2) * col("cumb") + col("cb0")
          - col("n_b"))).cast("long").as("num"))
      na.crossJoin(broadcast(nb)).crossJoin(broadcast(dm))
        .select(col("n_a"), col("n_b"), col("num").as("dominance"),
          expr("CAST(CASE WHEN num >= 0 THEN " +
            "ABS(num) * 1000000 div (n_a * n_b) " +
            "ELSE -(ABS(num) * 1000000 div (n_a * n_b)) END " +
            "AS BIGINT)").as("delta_ppm"),
          expr("CASE WHEN ABS(num) * 1000 < 147 * n_a * n_b " +
            "THEN 'negligible' " +
            "WHEN ABS(num) * 100 < 33 * n_a * n_b THEN 'small' " +
            "WHEN ABS(num) * 1000 < 474 * n_a * n_b THEN 'medium' " +
            "ELSE 'large' END").as("effect"))
    },

    // Gini coefficient of order spend per market segment — the
    // inequality summary every revenue-concentration dashboard
    // carries, exact: with the per-segment cents histogram and the
    // segment-keyed strictly-below cumulative, 2Σrᵢxᵢ =
    // Σ_v v·(2·c·cumb + c² + c) (tied values take consecutive ranks
    // — the sum is tie-order-invariant), so G = (2Σrx − (n+1)Σx)
    // / (n·Σx) is one nonnegative ppm floor (Chebyshev's sum
    // inequality makes the numerator ≥ 0, so // ≡ truncation in
    // both engines). Products ride DECIMAL(38,0) ≡ HUGEINT
    // (v·c·cumb ≈ price·n² passes 2^63 at ~10⁵ orders/segment).
    // Windows keyed by segment; no global anything.
    QuerySpec.sql(
      "stats_gini",
      """WITH v AS (
        |  SELECT c.c_mktsegment AS segment,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |h AS (SELECT segment, cents, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM v GROUP BY 1, 2),
        |r AS (
        |  SELECT segment, cents, c,
        |    COALESCE(SUM(c) OVER (PARTITION BY segment ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumb
        |  FROM h),
        |a AS (
        |  SELECT segment, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(cents * c) AS BIGINT) AS sx,
        |    CAST(SUM(CAST(cents AS HUGEINT)
        |      * (2 * c * cumb + c * c + c)) AS HUGEINT) AS s2r
        |  FROM r GROUP BY 1)
        |SELECT segment, n, sx AS sum_cents,
        |  CAST(CASE WHEN n > 0 AND sx > 0 THEN
        |    (s2r - (n + 1) * CAST(sx AS HUGEINT)) * 1000000
        |      // (CAST(n AS HUGEINT) * sx) END AS BIGINT) AS gini_ppm
        |FROM a ORDER BY segment""".stripMargin) { (s, dir) =>
      val v = Tables(s, dir, "orders").as("o")
        .join(Tables(s, dir, "customer").as("c"),
          col("c.c_custkey") === col("o.o_custkey"))
        .select(col("c.c_mktsegment").as("segment"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            .as("cents"))
      val h = v.groupBy(col("segment"), col("cents"))
        .agg(count(lit(1)).cast("long").as("c"))
      val wg = Window.partitionBy(col("segment")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("cumb", coalesce(sum(col("c")).over(wg), lit(0L)))
        .groupBy(col("segment"))
        .agg(sum(col("c")).cast("long").as("n"),
          sum(col("cents") * col("c")).cast("long").as("sx"),
          sum(expr("CAST(cents AS DECIMAL(38,0)) " +
            "* (2 * c * cumb + c * c + c)"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .as("s2r"))
        .select(col("segment"), col("n"), col("sx").as("sum_cents"),
          expr("CAST(CASE WHEN n > 0 AND sx > 0 THEN " +
            "(s2r - (n + 1) * CAST(sx AS DECIMAL(38,0))) * 1000000 " +
            "div (CAST(n AS DECIMAL(38,0)) * sx) END AS BIGINT)")
            .as("gini_ppm"))
        .orderBy(col("segment"))
    },

    // Kendall's W — the concordance coefficient across the k
    // event-type "judges" ranking the m complete days by activity:
    // do the types agree on which days were big? Tie-averaged ×2
    // ranks per judge from the (judge, value) histogram joined back
    // on the value (windows keyed by judge); S4 = Σ_d (R2_d −
    // k(m+1))² = 4S, so the tie-corrected W = 12S/(k²(m³−m) − kΣT)
    // = 3·S4/(k²(m³−m) − kΣT) is one nonnegative ppm floor. The
    // complete-block filter is the same as Friedman's (only days
    // every judge scored). m³ rides DECIMAL(38,0) ≡ HUGEINT past
    // the 2^63 envelope at m ≈ 2.1M days.
    QuerySpec.sql(
      "stats_kendall_w",
      """WITH cnts AS (
        |  SELECT event_type AS judge,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |kk AS (SELECT CAST(COUNT(DISTINCT judge) AS BIGINT) AS k
        |  FROM cnts),
        |f AS (
        |  SELECT c.* FROM cnts c
        |  JOIN (SELECT day FROM cnts, kk GROUP BY day, kk.k
        |    HAVING COUNT(*) = MAX(kk.k)) d ON d.day = c.day),
        |h AS (SELECT judge, x, CAST(COUNT(*) AS BIGINT) AS t
        |  FROM f GROUP BY 1, 2),
        |hw AS (
        |  SELECT judge, x, t,
        |    COALESCE(SUM(t) OVER (PARTITION BY judge ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumb
        |  FROM h),
        |rk AS (
        |  SELECT f.day, 2 * hw.cumb + hw.t + 1 AS r2
        |  FROM f JOIN hw ON hw.judge = f.judge AND hw.x = f.x),
        |mm AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS m
        |  FROM f),
        |s4 AS (
        |  SELECT CAST(SUM(CAST(rd - kk.k * (mm.m + 1) AS HUGEINT)
        |    * (rd - kk.k * (mm.m + 1))) AS HUGEINT) AS s4
        |  FROM (SELECT day, CAST(SUM(r2) AS BIGINT) AS rd
        |    FROM rk GROUP BY 1) z, kk, mm),
        |tt AS (
        |  SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t),
        |    0) AS HUGEINT) AS tsum
        |  FROM h),
        |de AS (
        |  SELECT kk.k, mm.m,
        |    CAST(kk.k AS HUGEINT) * kk.k
        |      * (CAST(mm.m AS HUGEINT) * mm.m * mm.m - mm.m)
        |      - kk.k * tt.tsum AS den
        |  FROM kk, mm, tt)
        |SELECT de.k, de.m, CAST(s4.s4 AS BIGINT) AS s4,
        |  CAST(CASE WHEN de.den > 0 THEN
        |    3 * s4.s4 * 1000000 // de.den END AS BIGINT) AS w_ppm
        |FROM de, s4""".stripMargin) { (s, dir) =>
      val cnts = Materialize.stable(events(s, dir)
        .groupBy(col("event_type").as("judge"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x")))
      val kk = cnts.agg(countDistinct(col("judge")).cast("long")
        .as("k"))
      val f = Materialize.stable(cnts
        .groupBy(col("day")).agg(count(lit(1)).as("nt"))
        .crossJoin(broadcast(kk))
        .filter(col("nt") === col("k"))
        .select(col("day"))
        .join(cnts, Seq("day")))
      val h = f.groupBy(col("judge"), col("x"))
        .agg(count(lit(1)).cast("long").as("t"))
      val wj = Window.partitionBy(col("judge")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val hw = h.withColumn("cumb",
        coalesce(sum(col("t")).over(wj), lit(0L)))
      val rk = f.join(hw, Seq("judge", "x"))
        .select(col("day"),
          (lit(2) * col("cumb") + col("t") + 1).as("r2"))
      val mm = f.agg(countDistinct(col("day")).cast("long").as("m"))
      val s4 = rk.groupBy(col("day"))
        .agg(sum(col("r2")).cast("long").as("rd"))
        .crossJoin(broadcast(kk)).crossJoin(broadcast(mm))
        .agg(sum(expr("CAST(rd - k * (m + 1) AS DECIMAL(38,0)) " +
          "* (rd - k * (m + 1))"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("s4"))
      val tt = h.agg(
        coalesce(sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t")),
          lit(0L).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("tsum"))
      kk.crossJoin(broadcast(mm)).crossJoin(broadcast(tt))
        .crossJoin(broadcast(s4))
        .withColumn("den",
          expr("CAST(k AS DECIMAL(38,0)) * k " +
            "* (CAST(m AS DECIMAL(38,0)) * m * m - m) - k * tsum"))
        .select(col("k"), col("m"),
          col("s4").cast("long").as("s4"),
          expr("CAST(CASE WHEN den > 0 THEN " +
            "3 * s4 * 1000000 div den END AS BIGINT)").as("w_ppm"))
    },

    // pass@k (Chen et al. 2021, the HumanEval estimator) — THE LLM
    // eval-suite metric, computed over a natural attempts frame:
    // problem = customer, attempts = their orders, success = a
    // finished ('F') order. pass@k = 1 − C(n−c,k)/C(n,k), evaluated
    // as the exact product Π_{i<k}(n−c−i)/Π_{i<k}(n−i) (never the
    // factorial form): both engines fold the k-term products through
    // DECIMAL(38,0)/HUGEINT, so the classically-float estimator is an
    // exact ppm integer, and the n−c<k / c=0 edges take lazy CASE
    // branches (no product is ever built over a negative run). The
    // corpus readout is the per-k mean plus the certain/zero problem
    // counts. Plan: one orders groupBy (map-side combinable), a
    // 3-row broadcast of k values, one final 3-group fold — no
    // window, no join wider than the k table.
    QuerySpec.sql(
      "eval_pass_at_k",
      """WITH pr AS (
        |  SELECT o_custkey AS problem,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |ks AS (SELECT * FROM (VALUES (1), (3), (5)) t(k)),
        |p AS (
        |  SELECT pr.problem, ks.k,
        |    CASE WHEN pr.c = 0 THEN CAST(0 AS BIGINT)
        |      WHEN pr.n - pr.c < ks.k THEN CAST(1000000 AS BIGINT)
        |      ELSE CAST(1000000 -
        |        list_reduce(list_transform(range(0, ks.k),
        |          i -> CAST(pr.n - pr.c - i AS HUGEINT)),
        |          (a, b) -> a * b) * 1000000
        |        // list_reduce(list_transform(range(0, ks.k),
        |          i -> CAST(pr.n - i AS HUGEINT)), (a, b) -> a * b)
        |        AS BIGINT)
        |    END AS pass_ppm
        |  FROM pr CROSS JOIN ks)
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_problems,
        |  CAST(SUM(CASE WHEN pass_ppm = 1000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_certain,
        |  CAST(SUM(CASE WHEN pass_ppm = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_zero,
        |  CAST(SUM(pass_ppm) // COUNT(*) AS BIGINT) AS mean_pass_ppm
        |FROM p GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
      val pr = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("problem"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("c"))
      val ks = s.range(1)
        .select(explode(array(lit(1), lit(3), lit(5))).as("k"))
      pr.crossJoin(broadcast(ks))
        .withColumn("pass_ppm", expr(
          """CASE WHEN c = 0 THEN CAST(0 AS BIGINT)
            |  WHEN n - c < k THEN CAST(1000000 AS BIGINT)
            |  ELSE CAST(1000000 -
            |    aggregate(sequence(0, k - 1),
            |      CAST(1 AS DECIMAL(38,0)),
            |      (acc, i) -> acc * (n - c - i)) * 1000000
            |    div aggregate(sequence(0, k - 1),
            |      CAST(1 AS DECIMAL(38,0)),
            |      (acc, i) -> acc * (n - i))
            |    AS BIGINT)
            |END""".stripMargin))
        .groupBy(col("k").cast("long").as("k"))
        .agg(count(lit(1)).as("n_problems"),
          sum(when(col("pass_ppm") === 1000000L, 1L).otherwise(0L))
            .as("n_certain"),
          sum(when(col("pass_ppm") === 0L, 1L).otherwise(0L))
            .as("n_zero"),
          expr("CAST(SUM(pass_ppm) div COUNT(*) AS BIGINT)")
            .as("mean_pass_ppm"))
        .orderBy(col("k"))
    },

    // Cochran–Mantel–Haenszel test: is the exposure→outcome
    // association (BUILDING-segment customer → finished order) real
    // once the order-priority strata are controlled for? The
    // stratified companion to stats_chi2_indep — THE guard against
    // Simpson's-paradox conclusions in any segmented funnel readout.
    // Per stratum: a = exposed∧outcome count, E and Var from the
    // hypergeometric null; the statistic ((|ΣA−ΣE|−½)²/ΣV, continuity
    // corrected) is folded entirely in ppm integers. The Var product
    // n1(n−n1)m1(n−m1)·10⁶/(n²(n−1)) is divided in TWO steps (by n,
    // then by n(n−1)) with the identical op order in both engines —
    // each step stays under DECIMAL(38,0)/HUGEINT for strata up to
    // ~10¹⁰ rows, far past the 100 TB envelope. Plan: one join
    // orders⋈customer (broadcast-eligible dim), one 5-group fold,
    // one scalar row.
    QuerySpec.sql(
      "stats_cmh",
      """WITH j AS (
        |  SELECT o.o_orderpriority AS stratum,
        |    CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
        |      AS e,
        |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |t AS (
        |  SELECT stratum,
        |    CAST(SUM(e * y) AS BIGINT) AS a,
        |    CAST(SUM(e) AS BIGINT) AS n1,
        |    CAST(SUM(y) AS BIGINT) AS m1,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM j GROUP BY 1),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(a) AS BIGINT) AS a_sum,
        |    CAST(SUM(CAST(n1 AS HUGEINT) * m1 * 1000000 // n)
        |      AS BIGINT) AS e_ppm,
        |    CAST(SUM(CASE WHEN n > 1 THEN
        |      (CAST(n1 AS HUGEINT) * (n - n1) * 1000000 // n)
        |        * (CAST(m1 AS HUGEINT) * (n - m1))
        |        // (CAST(n AS HUGEINT) * (n - 1))
        |      ELSE 0 END) AS BIGINT) AS v_ppm
        |  FROM t)
        |SELECT n_strata, a_sum, e_ppm, v_ppm,
        |  CAST(CASE WHEN v_ppm > 0 THEN
        |    CAST(GREATEST(ABS(a_sum * 1000000 - e_ppm) - 500000, 0)
        |      AS HUGEINT)
        |    * GREATEST(ABS(a_sum * 1000000 - e_ppm) - 500000, 0)
        |    // v_ppm END AS BIGINT) AS x2_micros,
        |  CASE WHEN v_ppm > 0 THEN
        |    CASE WHEN CAST(GREATEST(ABS(a_sum * 1000000 - e_ppm)
        |          - 500000, 0) AS HUGEINT)
        |        * GREATEST(ABS(a_sum * 1000000 - e_ppm) - 500000, 0)
        |        // v_ppm > 3841459
        |      THEN 'associated' ELSE 'independent' END
        |  END AS verdict
        |FROM s""".stripMargin) { (s, dir) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val j = Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
          col("c_custkey") === col("o_custkey"))
        .select(col("o_orderpriority").as("stratum"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
            .as("e"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L)
            .as("y"))
      val t = j.groupBy(col("stratum"))
        .agg(sum(col("e") * col("y")).as("a"),
          sum(col("e")).as("n1"), sum(col("y")).as("m1"),
          count(lit(1)).as("n"))
      t.agg(count(lit(1)).as("n_strata"),
          sum(col("a")).cast("long").as("a_sum"),
          sum(expr("CAST(n1 AS DECIMAL(38,0)) * m1 * 1000000 div n"))
            .cast("long").as("e_ppm"),
          sum(expr(
            """CASE WHEN n > 1 THEN
              |  (CAST(n1 AS DECIMAL(38,0)) * (n - n1) * 1000000
              |    div n)
              |  * (CAST(m1 AS DECIMAL(38,0)) * (n - m1))
              |  div (CAST(n AS DECIMAL(38,0)) * (n - 1))
              |ELSE CAST(0 AS BIGINT) END""".stripMargin))
            .cast("long").as("v_ppm"))
        .select(col("n_strata"), col("a_sum"), col("e_ppm"),
          col("v_ppm"),
          expr("CAST(CASE WHEN v_ppm > 0 THEN " +
            "CAST(GREATEST(ABS(a_sum * 1000000 - e_ppm) - 500000, 0)" +
            " AS DECIMAL(38,0))" +
            " * GREATEST(ABS(a_sum * 1000000 - e_ppm) - 500000, 0)" +
            " div v_ppm END AS BIGINT)").as("x2_micros"),
          expr("CASE WHEN v_ppm > 0 THEN CASE WHEN " +
            "CAST(GREATEST(ABS(a_sum * 1000000 - e_ppm) - 500000, 0)" +
            " AS DECIMAL(38,0))" +
            " * GREATEST(ABS(a_sum * 1000000 - e_ppm) - 500000, 0)" +
            " div v_ppm > 3841459 THEN 'associated' " +
            "ELSE 'independent' END END").as("verdict"))
    },

    // Breslow–Day homogeneity test — the companion stats_cmh owes its
    // consumers: CMH assumes the odds ratio is COMMON across strata;
    // BD tests that assumption (a significant CMH with heterogeneous
    // ORs is a Simpson's-paradox report waiting to happen). Same
    // exposure/outcome/strata as stats_cmh. The MH common-OR
    // components fold as exact micro integers (a·d·10⁶ // N per
    // stratum through HUGEINT/DECIMAL(38,0) — order-safe integer
    // sums, never a float accumulation); ψ = rr/ss, each stratum's
    // expected a-cell is the in-range root of the BD quadratic
    // (ψ−1)E² − [ψ(r1+c1) + N−r1−c1]E + ψ·r1·c1 = 0 (root picked by
    // the margin box, linear branch at |ψ−1| < 1e−12), the variance
    // is the 4-cell harmonic form, and each (a−E)²/V term quantizes
    // to micro BEFORE the cross-stratum sum (the anova lesson: a
    // 5-row DOUBLE sum is partition-order-nondeterministic; a 5-row
    // integer sum is not). Every float op is ONE shared expression
    // text over int64 margins + the ψ micros. Verdict vs the fixed
    // χ²(4) 5% micro literal 9487729 (df = strata − 1 = 4). Plan: one
    // broadcast dim join + a 5-row CTE chain.
    QuerySpec.sql(
      "stats_breslow_day",
      """WITH j AS (
        |  SELECT o.o_orderpriority AS stratum,
        |    CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
        |      AS e,
        |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |s AS (
        |  SELECT stratum,
        |    CAST(SUM(e * y) AS BIGINT) AS a,
        |    CAST(SUM(e * (1 - y)) AS BIGINT) AS b,
        |    CAST(SUM((1 - e) * y) AS BIGINT) AS c,
        |    CAST(SUM((1 - e) * (1 - y)) AS BIGINT) AS d
        |  FROM j GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(CAST(a AS HUGEINT) * d * 1000000
        |      // (a + b + c + d)) AS BIGINT) AS rr_micro,
        |    CAST(SUM(CAST(b AS HUGEINT) * c * 1000000
        |      // (a + b + c + d)) AS BIGINT) AS ss_micro
        |  FROM s),
        |g AS (SELECT s.a, s.b, s.c, s.d,
        |    s.a + s.b + s.c + s.d AS n, s.a + s.b AS r1,
        |    s.a + s.c AS c1, m.n_strata, m.rr_micro, m.ss_micro,
        |    CAST(m.rr_micro AS DOUBLE) / CAST(m.ss_micro AS DOUBLE)
        |      AS psi
        |  FROM s, m),
        |q2 AS (SELECT *, psi - 1 AS qa,
        |    -(psi * CAST(r1 + c1 AS DOUBLE)
        |      + CAST(n - r1 - c1 AS DOUBLE)) AS qb,
        |    psi * CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE) AS qc
        |  FROM g),
        |q3 AS (SELECT *, sqrt(qb * qb - 4 * qa * qc) AS sq FROM q2),
        |q4 AS (SELECT *, CASE WHEN ABS(qa) < 1e-12 THEN -qc / qb
        |    ELSE CASE WHEN (-qb - sq) / (2 * qa)
        |          > GREATEST(CAST(0 AS DOUBLE),
        |            CAST(r1 + c1 - n AS DOUBLE))
        |        AND (-qb - sq) / (2 * qa)
        |          < LEAST(CAST(r1 AS DOUBLE), CAST(c1 AS DOUBLE))
        |      THEN (-qb - sq) / (2 * qa)
        |      ELSE (-qb + sq) / (2 * qa) END END AS ea FROM q3),
        |q5 AS (SELECT *,
        |    CASE WHEN ea > 0 AND CAST(r1 AS DOUBLE) - ea > 0
        |        AND CAST(c1 AS DOUBLE) - ea > 0
        |        AND CAST(n - r1 - c1 AS DOUBLE) + ea > 0 THEN
        |      1 / (1 / ea + 1 / (CAST(r1 AS DOUBLE) - ea)
        |        + 1 / (CAST(c1 AS DOUBLE) - ea)
        |        + 1 / (CAST(n - r1 - c1 AS DOUBLE) + ea)) END AS vv
        |  FROM q4),
        |tm AS (SELECT n_strata, rr_micro, ss_micro,
        |    CAST(CAST(CASE WHEN vv > 0 THEN
        |        (CAST(a AS DOUBLE) - ea) * (CAST(a AS DOUBLE) - ea)
        |          / vv
        |      ELSE CAST(0 AS DOUBLE) END AS DECIMAL(18,6)) * 1000000
        |      AS BIGINT) AS term
        |  FROM q5)
        |SELECT n_strata, rr_micro, ss_micro,
        |  CAST(SUM(term) AS BIGINT) AS bd_micro,
        |  CASE WHEN CAST(SUM(term) AS BIGINT) > 9487729
        |    THEN 'heterogeneous' ELSE 'homogeneous' END AS verdict
        |FROM tm GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val j = Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
          col("c_custkey") === col("o_custkey"))
        .select(col("o_orderpriority").as("stratum"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
            .as("e"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L)
            .as("y"))
      val sdf = j.groupBy(col("stratum"))
        .agg(sum(col("e") * col("y")).cast("long").as("a"),
          sum(col("e") * (lit(1L) - col("y"))).cast("long").as("b"),
          sum((lit(1L) - col("e")) * col("y")).cast("long").as("c"),
          sum((lit(1L) - col("e")) * (lit(1L) - col("y")))
            .cast("long").as("d"))
      val m = sdf.agg(count(lit(1)).as("n_strata"),
        sum(expr("CAST(a AS DECIMAL(38,0)) * d * 1000000 " +
          "div (a + b + c + d)")).cast("long").as("rr_micro"),
        sum(expr("CAST(b AS DECIMAL(38,0)) * c * 1000000 " +
          "div (a + b + c + d)")).cast("long").as("ss_micro"))
      sdf.crossJoin(broadcast(m))
        .withColumn("n", expr("a + b + c + d"))
        .withColumn("r1", expr("a + b"))
        .withColumn("c1", expr("a + c"))
        .withColumn("psi", expr(
          "CAST(rr_micro AS DOUBLE) / CAST(ss_micro AS DOUBLE)"))
        .withColumn("qa", expr("psi - 1"))
        .withColumn("qb", expr("-(psi * CAST(r1 + c1 AS DOUBLE) " +
          "+ CAST(n - r1 - c1 AS DOUBLE))"))
        .withColumn("qc", expr(
          "psi * CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE)"))
        .withColumn("sq", expr("sqrt(qb * qb - 4 * qa * qc)"))
        .withColumn("ea", expr(
          """CASE WHEN ABS(qa) < 1e-12 THEN -qc / qb
            |  ELSE CASE WHEN (-qb - sq) / (2 * qa)
            |        > GREATEST(CAST(0 AS DOUBLE),
            |          CAST(r1 + c1 - n AS DOUBLE))
            |      AND (-qb - sq) / (2 * qa)
            |        < LEAST(CAST(r1 AS DOUBLE), CAST(c1 AS DOUBLE))
            |    THEN (-qb - sq) / (2 * qa)
            |    ELSE (-qb + sq) / (2 * qa) END END""".stripMargin))
        .withColumn("vv", expr(
          """CASE WHEN ea > 0 AND CAST(r1 AS DOUBLE) - ea > 0
            |    AND CAST(c1 AS DOUBLE) - ea > 0
            |    AND CAST(n - r1 - c1 AS DOUBLE) + ea > 0 THEN
            |  1 / (1 / ea + 1 / (CAST(r1 AS DOUBLE) - ea)
            |    + 1 / (CAST(c1 AS DOUBLE) - ea)
            |    + 1 / (CAST(n - r1 - c1 AS DOUBLE) + ea)) END"""
            .stripMargin))
        .withColumn("term", expr(
          """CAST(CAST(CASE WHEN vv > 0 THEN
            |    (CAST(a AS DOUBLE) - ea) * (CAST(a AS DOUBLE) - ea)
            |      / vv
            |  ELSE CAST(0 AS DOUBLE) END AS DECIMAL(18,6)) * 1000000
            |  AS BIGINT)""".stripMargin))
        .groupBy(col("n_strata"), col("rr_micro"), col("ss_micro"))
        .agg(sum(col("term")).cast("long").as("bd_micro"))
        .select(col("n_strata"), col("rr_micro"), col("ss_micro"),
          col("bd_micro"),
          expr("CASE WHEN bd_micro > 9487729 THEN 'heterogeneous' " +
            "ELSE 'homogeneous' END").as("verdict"))
    },

    // Page–Hinkley drift monitor with a STEP-RESPONSE calibration —
    // the sequential change-of-mean detector (Page 1954, the PH test
    // every streaming drift library ships next to CUSUM): M_t
    // accumulates each observation's deviation from the RUNNING mean
    // and alarms when M_t climbs λ above its own running minimum.
    // Each daily-count series is monitored twice: `raw` (stationary —
    // must NOT alarm) and `step` (counts doubled from mid-window — a
    // +100% mean shift the detector MUST catch), the calibration
    // harness a production monitor owes its operators. λ = 3.5× the
    // series mean is scale-free and sits in the measured gap (raw
    // ph/mean ≤ 2.93, step ≥ 4.15 across all three SFs). Exact in
    // ppm: the running mean is the prefix-sum // row-number
    // truncation shared verbatim with the oracle, so M, its running
    // min, the PH gap, and λ are all integers. Plan: three
    // (series,variant)-partitioned windows over the calendar-bounded
    // daily frame — no global window, no join wider than the 10-row
    // λ table.
    QuerySpec.sql(
      "ts_page_hinkley",
      """WITH cnts AS (
        |  SELECT event_type AS series,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |v AS (
        |  SELECT series, 'raw' AS variant, day, x FROM cnts
        |  UNION ALL
        |  SELECT series, 'step', day,
        |    CASE WHEN day >= DATE '2024-01-16' THEN 2 * x ELSE x END
        |  FROM cnts),
        |o AS (
        |  SELECT series, variant, day, x,
        |    CAST(SUM(x) OVER (PARTITION BY series, variant
        |      ORDER BY day) AS BIGINT) AS sx,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY series, variant
        |      ORDER BY day) AS BIGINT) AS i
        |  FROM v),
        |d AS (
        |  SELECT series, variant, day,
        |    x * 1000000 - sx * 1000000 // i AS dev
        |  FROM o),
        |m AS (
        |  SELECT series, variant, day,
        |    CAST(SUM(dev) OVER (PARTITION BY series, variant
        |      ORDER BY day) AS BIGINT) AS mt
        |  FROM d),
        |ph AS (
        |  SELECT series, variant, day,
        |    CAST(mt - MIN(mt) OVER (PARTITION BY series, variant
        |      ORDER BY day) AS BIGINT) AS ph
        |  FROM m),
        |lam AS (
        |  SELECT series, variant,
        |    CAST(7 * (SUM(x) * 1000000 // COUNT(*)) // 2 AS BIGINT)
        |      AS lambda_ppm
        |  FROM v GROUP BY 1, 2)
        |SELECT ph.series AS series, ph.variant AS variant,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(MAX(ph.ph) AS BIGINT) AS ph_max_ppm,
        |  MAX(lam.lambda_ppm) AS lambda_ppm,
        |  MIN(CASE WHEN ph.ph > lam.lambda_ppm THEN ph.day END)
        |    AS alarm_day,
        |  CAST(CASE WHEN MAX(ph.ph) > MAX(lam.lambda_ppm)
        |    THEN 1 ELSE 0 END AS BIGINT) AS alarmed
        |FROM ph JOIN lam
        |  ON lam.series = ph.series AND lam.variant = ph.variant
        |GROUP BY 1, 2
        |ORDER BY series, variant""".stripMargin) { (s, dir) =>
      val cnts = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
      val v = cnts.select(col("series"), lit("raw").as("variant"),
          col("day"), col("x"))
        .unionByName(cnts.select(col("series"),
          lit("step").as("variant"), col("day"),
          when(col("day") >= lit("2024-01-16").cast("date"),
            lit(2L) * col("x")).otherwise(col("x")).as("x")))
      val w = Window.partitionBy(col("series"), col("variant"))
        .orderBy(col("day"))
      val ph = v
        .select(col("series"), col("variant"), col("day"),
          (col("x") * lit(1000000L)).as("xp"),
          sum(col("x")).over(w).cast("long").as("sx"),
          row_number().over(w).cast("long").as("i"))
        .select(col("series"), col("variant"), col("day"),
          (col("xp") - expr("sx * 1000000 div i")).as("dev"))
        .select(col("series"), col("variant"), col("day"),
          sum(col("dev")).over(w).cast("long").as("mt"))
        .select(col("series"), col("variant"), col("day"),
          (col("mt") - min(col("mt")).over(w)).cast("long").as("ph"))
      val lam = v.groupBy(col("series"), col("variant"))
        .agg(expr("CAST(7 * (SUM(x) * 1000000 div COUNT(*)) div 2 " +
          "AS BIGINT)").as("lambda_ppm"))
      ph.join(lam, Seq("series", "variant"))
        .groupBy(col("series"), col("variant"))
        .agg(count(lit(1)).as("n_days"),
          max(col("ph")).cast("long").as("ph_max_ppm"),
          max(col("lambda_ppm")).as("lambda_ppm"),
          min(when(col("ph") > col("lambda_ppm"), col("day")))
            .as("alarm_day"),
          expr("CAST(CASE WHEN MAX(ph) > MAX(lambda_ppm) " +
            "THEN 1 ELSE 0 END AS BIGINT)").as("alarmed"))
        .orderBy(col("series"), col("variant"))
    },

    // Motif + discord discovery per series (the matrix-profile
    // readout, Yeh et al. 2016, on the calendar-bounded daily frame):
    // the MOTIF is the closest pair of non-overlapping length-5
    // subsequences (the series' most repeated shape), the DISCORD the
    // subsequence whose nearest neighbor is farthest (its strangest
    // week). Distances are raw squared Euclidean in exact BIGINT (no
    // z-normalization — counts share a scale within a series), and
    // both argmins resolve by explicit min-then-join-back with
    // day-order tie-breaks, never an engine-specific arg_min. The
    // pair surface is (n−4)²/2 per series with n = calendar days —
    // windows-per-series bounded, never corpus²; at 100 TB the frame
    // is still |series|·days rows. Plan: series-keyed LEAD windows →
    // series-keyed self-join on the bounded window table → bounded
    // folds.
    QuerySpec.sql(
      "ts_motif_discovery",
      """WITH cnts AS (
        |  SELECT event_type AS series,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |w0 AS (
        |  SELECT series, day,
        |    CAST(ROW_NUMBER() OVER sw AS BIGINT) AS i, x,
        |    LEAD(x, 1) OVER sw AS x1, LEAD(x, 2) OVER sw AS x2,
        |    LEAD(x, 3) OVER sw AS x3, LEAD(x, 4) OVER sw AS x4
        |  FROM cnts WINDOW sw AS (PARTITION BY series ORDER BY day)),
        |w AS (SELECT * FROM w0 WHERE x4 IS NOT NULL),
        |p AS (
        |  SELECT a.series AS series, a.i AS i, b.i AS j,
        |    a.day AS di, b.day AS dj,
        |    (a.x - b.x) * (a.x - b.x) + (a.x1 - b.x1) * (a.x1 - b.x1)
        |    + (a.x2 - b.x2) * (a.x2 - b.x2)
        |    + (a.x3 - b.x3) * (a.x3 - b.x3)
        |    + (a.x4 - b.x4) * (a.x4 - b.x4) AS dist
        |  FROM w a JOIN w b
        |    ON b.series = a.series AND b.i >= a.i + 5),
        |mo AS (SELECT series, MIN(dist) AS motif_dist
        |  FROM p GROUP BY 1),
        |mi AS (
        |  SELECT p.series AS series, MIN(p.di) AS motif_day_i,
        |    MIN(p.dj) AS motif_day_j, MIN(p.dist) AS motif_dist
        |  FROM p JOIN mo ON mo.series = p.series
        |    AND p.dist = mo.motif_dist
        |  WHERE p.di = (SELECT MIN(p2.di) FROM p p2
        |    JOIN mo mo2 ON mo2.series = p2.series
        |      AND p2.dist = mo2.motif_dist
        |    WHERE p2.series = p.series)
        |  GROUP BY 1),
        |nn AS (
        |  SELECT series, i, day, MIN(dist) AS nn_dist FROM (
        |    SELECT series, i, di AS day, dist FROM p
        |    UNION ALL
        |    SELECT series, j, dj, dist FROM p) u
        |  GROUP BY 1, 2, 3),
        |dm AS (SELECT series, MAX(nn_dist) AS discord_dist
        |  FROM nn GROUP BY 1)
        |SELECT mi.series AS series,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM w
        |   WHERE w.series = mi.series) AS n_windows,
        |  mi.motif_day_i, mi.motif_day_j,
        |  CAST(mi.motif_dist AS BIGINT) AS motif_dist,
        |  (SELECT MIN(nn.day) FROM nn JOIN dm
        |     ON dm.series = nn.series AND nn.nn_dist = dm.discord_dist
        |   WHERE nn.series = mi.series) AS discord_day,
        |  (SELECT CAST(MAX(discord_dist) AS BIGINT) FROM dm
        |   WHERE dm.series = mi.series) AS discord_dist
        |FROM mi
        |ORDER BY series""".stripMargin) { (s, dir) =>
      val sw = Window.partitionBy(col("series")).orderBy(col("day"))
      val w = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
        .select(col("series"), col("day"),
          row_number().over(sw).cast("long").as("i"), col("x"),
          lead(col("x"), 1).over(sw).as("x1"),
          lead(col("x"), 2).over(sw).as("x2"),
          lead(col("x"), 3).over(sw).as("x3"),
          lead(col("x"), 4).over(sw).as("x4"))
        .filter(col("x4").isNotNull)
      val a = w.select(col("series"), col("i"), col("day").as("di"),
        col("x").as("ax"), col("x1").as("ax1"), col("x2").as("ax2"),
        col("x3").as("ax3"), col("x4").as("ax4"))
      val b = w.select(col("series"), col("i").as("j"),
        col("day").as("dj"), col("x").as("bx"), col("x1").as("bx1"),
        col("x2").as("bx2"), col("x3").as("bx3"), col("x4").as("bx4"))
      val p = a.join(b, Seq("series"))
        .filter(col("j") >= col("i") + 5)
        .select(col("series"), col("i"), col("j"), col("di"),
          col("dj"),
          ((col("ax") - col("bx")) * (col("ax") - col("bx"))
            + (col("ax1") - col("bx1")) * (col("ax1") - col("bx1"))
            + (col("ax2") - col("bx2")) * (col("ax2") - col("bx2"))
            + (col("ax3") - col("bx3")) * (col("ax3") - col("bx3"))
            + (col("ax4") - col("bx4")) * (col("ax4") - col("bx4")))
            .as("dist"))
      val mo = p.groupBy(col("series"))
        .agg(min(col("dist")).as("motif_dist"))
      val atMin = p.join(mo, Seq("series"))
        .filter(col("dist") === col("motif_dist"))
      val minDi = atMin.groupBy(col("series"))
        .agg(min(col("di")).as("min_di"))
      val mi = atMin.join(minDi, Seq("series"))
        .filter(col("di") === col("min_di"))
        .groupBy(col("series"))
        .agg(min(col("di")).as("motif_day_i"),
          min(col("dj")).as("motif_day_j"),
          min(col("dist")).cast("long").as("motif_dist"))
      val nn = p.select(col("series"), col("i"), col("di").as("day"),
          col("dist"))
        .unionByName(p.select(col("series"), col("j").as("i"),
          col("dj").as("day"), col("dist")))
        .groupBy(col("series"), col("i"), col("day"))
        .agg(min(col("dist")).as("nn_dist"))
      val dm = nn.groupBy(col("series"))
        .agg(max(col("nn_dist")).as("discord_dist"))
      val disc = nn.join(dm, Seq("series"))
        .filter(col("nn_dist") === col("discord_dist"))
        .groupBy(col("series"))
        .agg(min(col("day")).as("discord_day"),
          max(col("nn_dist")).cast("long").as("discord_dist"))
      val nw = w.groupBy(col("series"))
        .agg(count(lit(1)).as("n_windows"))
      mi.join(nw, Seq("series")).join(disc, Seq("series"))
        .select(col("series"), col("n_windows"), col("motif_day_i"),
          col("motif_day_j"), col("motif_dist"), col("discord_day"),
          col("discord_dist"))
        .orderBy(col("series"))
    },

    // Bradley–Terry arena ratings — rank items from PAIRWISE win
    // counts (the Chatbot-Arena / LMSYS leaderboard model): each day
    // is a head-to-head between every pair of event types (higher
    // daily count wins, ties void), and three Hunter-2004 MM rounds
    // r_i ← W_i / Σ_j n_ij/(r_i+r_j) are UNROLLED with every rating
    // micro-quantized and sum-normalized to 5·10⁶ per round — the
    // same unrolled-rounds discipline as the pagerank/BPE oracles, so
    // the classically-float fixed point is an exact integer chain in
    // both engines. The final rank is a count-of-dominators fold (no
    // window at all). Plan: one daily rollup, a day-keyed k²-bounded
    // pair join, then three joins over the |items|-row rating table —
    // everything after the rollup is k-bounded however large the
    // event log.
    QuerySpec.sql(
      "eval_bt_arena", {
        def round(rin: String, k: Int): String =
          s"""s$k AS (
             |  SELECT e.t AS t,
             |    CAST(SUM(e.n * 1000000000000 // (ra.r + rb.r))
             |      AS BIGINT) AS s
             |  FROM e JOIN $rin ra ON ra.t = e.t
             |  JOIN $rin rb ON rb.t = e.o GROUP BY 1),
             |r${k}u AS (
             |  SELECT wt.t AS t, CASE WHEN wt.wins = 0 OR s$k.s = 0
             |    THEN CAST(1 AS BIGINT)
             |    ELSE CAST(wt.wins * 1000000000000 // s$k.s AS BIGINT)
             |    END AS r
             |  FROM wt JOIN s$k ON s$k.t = wt.t),
             |r$k AS (
             |  SELECT t, CAST(r * 5000000 // (SELECT SUM(r) FROM r${k}u)
             |    AS BIGINT) AS r
             |  FROM r${k}u)""".stripMargin
        s"""WITH cnts AS (
           |  SELECT event_type AS series,
           |    CAST(date_trunc('day', ts) AS DATE) AS day,
           |    CAST(COUNT(*) AS BIGINT) AS x
           |  FROM events GROUP BY 1, 2),
           |m AS (
           |  SELECT a.series AS i, b.series AS j,
           |    CASE WHEN a.x > b.x THEN 1 ELSE 0 END AS wi
           |  FROM cnts a JOIN cnts b
           |    ON b.day = a.day AND b.series > a.series
           |  WHERE a.x <> b.x),
           |pair AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(wi) AS BIGINT) AS wij
           |  FROM m GROUP BY 1, 2),
           |e AS (SELECT i AS t, j AS o, n, wij AS w FROM pair
           |  UNION ALL SELECT j, i, n, n - wij FROM pair),
           |wt AS (SELECT t, CAST(SUM(w) AS BIGINT) AS wins,
           |    CAST(SUM(n) AS BIGINT) AS nm FROM e GROUP BY 1),
           |r0 AS (SELECT t, CAST(1000000 AS BIGINT) AS r FROM wt),
           |${round("r0", 1)},
           |${round("r1", 2)},
           |${round("r2", 3)}
           |SELECT wt.t AS event_type, wt.nm AS n_matches, wt.wins,
           |  r3.r AS bt_rating_micro,
           |  CAST(1 + (SELECT COUNT(*) FROM r3 o JOIN wt wo
           |    ON wo.t = o.t
           |    WHERE o.r > r3.r OR (o.r = r3.r AND o.t < r3.t))
           |    AS BIGINT) AS rank
           |FROM wt JOIN r3 ON r3.t = wt.t
           |ORDER BY event_type""".stripMargin
      }) { (s, dir) =>
      val cnts = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
      val a = cnts.select(col("day"), col("series").as("i"),
        col("x").as("xa"))
      val b = cnts.select(col("day"), col("series").as("j"),
        col("x").as("xb"))
      val pair = a.join(b, Seq("day"))
        .filter(col("j") > col("i") && col("xa") =!= col("xb"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("xa") > col("xb"), 1L).otherwise(0L))
            .as("wij"))
      val e = pair.select(col("i").as("t"), col("j").as("o"),
          col("n"), col("wij").as("w"))
        .unionByName(pair.select(col("j").as("t"), col("i").as("o"),
          col("n"), (col("n") - col("wij")).as("w")))
      // The |items|-row tables iterate 3 MM rounds; without lineage
      // truncation every later reference re-derives the whole chain
      // exponentially (measured 26 s at sf0.1) — the k-means/pagerank
      // Materialize.stable discipline brings it back to the rollup's
      // cost.
      val eS = Materialize.stable(e)
      val wt = Materialize.stable(eS.groupBy(col("t"))
        .agg(sum(col("w")).cast("long").as("wins"),
          sum(col("n")).cast("long").as("nm")))
      var r = wt.select(col("t"), lit(1000000L).as("r"))
      for (_ <- 1 to 3) {
        val sK = eS
          .join(broadcast(r.select(col("t"), col("r").as("rt"))),
            Seq("t"))
          .join(broadcast(r.select(col("t").as("o"),
            col("r").as("ro"))), Seq("o"))
          .groupBy(col("t"))
          .agg(sum(expr("n * 1000000000000 div (rt + ro)"))
            .cast("long").as("s"))
        val ru = wt.join(sK, Seq("t"))
          .select(col("t"),
            expr("CASE WHEN wins = 0 OR s = 0 THEN CAST(1 AS BIGINT)" +
              " ELSE CAST(wins * 1000000000000 div s AS BIGINT) END")
              .as("r"))
        val tot = ru.agg(sum(col("r")).as("rs"))
        r = Materialize.stable(ru.crossJoin(broadcast(tot))
          .select(col("t"),
            expr("CAST(r * 5000000 div rs AS BIGINT)").as("r")))
      }
      val dominators = r.select(col("t").as("ot"), col("r").as("or"))
      val ranked = r.join(dominators,
          col("or") > col("r") ||
            (col("or") === col("r") && col("ot") < col("t")), "left")
        .groupBy(col("t"), col("r"))
        .agg((lit(1L) + count(col("ot"))).as("rank"))
      wt.join(ranked, Seq("t"))
        .select(col("t").as("event_type"), col("nm").as("n_matches"),
          col("wins"), col("r").as("bt_rating_micro"), col("rank"))
        .orderBy(col("event_type"))
    },

    // Permutation entropy per series (Bandt–Pompe 2002) — the
    // complexity measure that reads a series' DYNAMICS (how varied
    // are its local up/down shapes) where the value-domain entropies
    // read its distribution. Each 3-day window maps to its strict
    // ordinal code (three pairwise comparisons → 3 bits; ties fold to
    // 0 deterministically in both engines), and H = ln n − Σc·ln c/n
    // follows the one shared micro-ln discipline (text_entropy_rate's
    // fold). h_norm_ppm divides by the ln 3! = 1791759 micro literal.
    // Plan: series-keyed double-LEAD window → 8-ary groupBy →
    // per-series fold; nothing wider than the daily frame.
    QuerySpec.sql(
      "ts_permutation_entropy", {
        def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
          s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH cnts AS (
           |  SELECT event_type AS series,
           |    CAST(date_trunc('day', ts) AS DATE) AS day,
           |    CAST(COUNT(*) AS BIGINT) AS x
           |  FROM events GROUP BY 1, 2),
           |w AS (
           |  SELECT series, x,
           |    LEAD(x, 1) OVER sw AS x1, LEAD(x, 2) OVER sw AS x2
           |  FROM cnts WINDOW sw AS (PARTITION BY series ORDER BY day)),
           |pat AS (
           |  SELECT series,
           |    CAST(CASE WHEN x1 > x THEN 4 ELSE 0 END
           |      + CASE WHEN x2 > x1 THEN 2 ELSE 0 END
           |      + CASE WHEN x2 > x THEN 1 ELSE 0 END AS BIGINT)
           |      AS code
           |  FROM w WHERE x2 IS NOT NULL),
           |c AS (SELECT series, code, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM pat GROUP BY 1, 2),
           |h AS (SELECT series, CAST(SUM(c) AS BIGINT) AS n,
           |    CAST(COUNT(*) AS BIGINT) AS k,
           |    CAST(SUM(c * ${lnm("c")}) AS BIGINT) AS s
           |  FROM c GROUP BY 1),
           |dm AS (SELECT series, MAX(c) AS mc FROM c GROUP BY 1),
           |dom AS (SELECT c.series AS series, MIN(c.code) AS dom_code
           |  FROM c JOIN dm ON dm.series = c.series AND c.c = dm.mc
           |  GROUP BY 1)
           |SELECT h.series AS series, h.n AS n_patterns,
           |  h.k AS n_codes,
           |  CAST(${lnm("h.n")} - h.s // h.n AS BIGINT) AS h_micro,
           |  CAST((${lnm("h.n")} - h.s // h.n) * 1000000 // 1791759
           |    AS BIGINT) AS h_norm_ppm,
           |  dom.dom_code
           |FROM h JOIN dom ON dom.series = h.series
           |ORDER BY series""".stripMargin
      }) { (s, dir) =>
      def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
        s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      val sw = Window.partitionBy(col("series")).orderBy(col("day"))
      val c = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
        .select(col("series"), col("x"),
          lead(col("x"), 1).over(sw).as("x1"),
          lead(col("x"), 2).over(sw).as("x2"))
        .filter(col("x2").isNotNull)
        .select(col("series"),
          (when(col("x1") > col("x"), 4L).otherwise(0L)
            + when(col("x2") > col("x1"), 2L).otherwise(0L)
            + when(col("x2") > col("x"), 1L).otherwise(0L)).as("code"))
        .groupBy(col("series"), col("code"))
        .agg(count(lit(1)).as("c"))
      val h = c.groupBy(col("series"))
        .agg(sum(col("c")).cast("long").as("n"),
          count(lit(1)).as("k"),
          sum(col("c") * expr(lnm("c"))).cast("long").as("s"))
      val dm = c.groupBy(col("series")).agg(max(col("c")).as("mc"))
      val dom = c.join(dm, Seq("series"))
        .filter(col("c") === col("mc"))
        .groupBy(col("series")).agg(min(col("code")).as("dom_code"))
      h.join(dom, Seq("series"))
        .select(col("series"), col("n").as("n_patterns"),
          col("k").as("n_codes"),
          expr(s"CAST(${lnm("n")} - s div n AS BIGINT)").as("h_micro"),
          expr(s"CAST((${lnm("n")} - s div n) * 1000000 div 1791759 " +
            "AS BIGINT)").as("h_norm_ppm"),
          col("dom_code"))
        .orderBy(col("series"))
    },

    // SAX symbolization per series (Lin/Keogh 2003): PAA-compress the
    // daily series into 6 equal-width segments, z-score each segment
    // mean against the series' own mean/σ, and bin into the 4-letter
    // alphabet at the ±0.6745σ Gaussian breakpoints — the
    // discretization under every symbolic TS index. Exact without
    // evaluating σ: each |dev| vs 0.6745σ test cross-multiplies to
    // dev²·10⁸ vs 45495025·σ²-numerator integers in DECIMAL(38,0)/
    // HUGEINT (0.6745² = 0.45495025 exactly), so the word — the
    // gate's payload — involves no float at all. Plan: one daily
    // rollup, a 6-ary segment fold keyed by series, a broadcast
    // series-moments join; the word assembles from a sorted 6-element
    // collected array (bounded by construction).
    QuerySpec.sql(
      "ts_sax_symbols",
      """WITH cnts AS (
        |  SELECT event_type AS series,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |ix AS (
        |  SELECT series, x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY series ORDER BY day)
        |      - 1 AS BIGINT) AS i,
        |    CAST(COUNT(*) OVER (PARTITION BY series) AS BIGINT) AS n
        |  FROM cnts),
        |seg AS (
        |  SELECT series, i * 6 // n AS g,
        |    CAST(SUM(x) * 1000000 // COUNT(*) AS BIGINT) AS m
        |  FROM ix GROUP BY 1, 2),
        |mo AS (
        |  SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM ix GROUP BY 1),
        |sym AS (
        |  SELECT seg.series AS series, seg.g AS g,
        |    CASE
        |      WHEN (seg.m - mo.sx * 1000000 // mo.n) < 0 THEN
        |        CASE WHEN CAST((seg.m - mo.sx * 1000000 // mo.n)
        |            AS HUGEINT)
        |            * (seg.m - mo.sx * 1000000 // mo.n)
        |            * mo.n * mo.n * 100000000
        |          > CAST(45495025 AS HUGEINT) * 1000000000000
        |            * (mo.n * mo.sxx - mo.sx * mo.sx)
        |          THEN 'a' ELSE 'b' END
        |      ELSE
        |        CASE WHEN CAST((seg.m - mo.sx * 1000000 // mo.n)
        |            AS HUGEINT)
        |            * (seg.m - mo.sx * 1000000 // mo.n)
        |            * mo.n * mo.n * 100000000
        |          > CAST(45495025 AS HUGEINT) * 1000000000000
        |            * (mo.n * mo.sxx - mo.sx * mo.sx)
        |          THEN 'd' ELSE 'c' END
        |    END AS sym
        |  FROM seg JOIN mo ON mo.series = seg.series)
        |SELECT sym.series AS series,
        |  (SELECT MAX(n) FROM mo WHERE mo.series = sym.series)
        |    AS n_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  string_agg(sym.sym, '' ORDER BY sym.g) AS sax_word,
        |  CAST(COUNT(DISTINCT sym.sym) AS BIGINT) AS n_symbols
        |FROM sym GROUP BY 1
        |ORDER BY series""".stripMargin) { (s, dir) =>
      val sw = Window.partitionBy(col("series")).orderBy(col("day"))
      val swAll = Window.partitionBy(col("series"))
      val ix = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
        .select(col("series"), col("x"),
          (row_number().over(sw) - 1).cast("long").as("i"),
          count(lit(1)).over(swAll).cast("long").as("n"))
      val seg = ix.groupBy(col("series"),
          expr("i * 6 div n").as("g"))
        .agg(expr("CAST(SUM(x) * 1000000 div COUNT(*) AS BIGINT)")
          .as("m"))
      val mo = ix.groupBy(col("series"))
        .agg(count(lit(1)).as("n"), sum(col("x")).cast("long").as("sx"),
          sum(col("x") * col("x")).cast("long").as("sxx"))
      val devSq = "CAST((m - sx * 1000000 div n) AS DECIMAL(38,0)) " +
        "* (m - sx * 1000000 div n) * n * n * 100000000"
      val bound = "CAST(45495025 AS DECIMAL(38,0)) * 1000000000000 " +
        "* (n * sxx - sx * sx)"
      seg.join(mo, Seq("series"))
        .select(col("series"), col("g"), col("n"),
          expr(s"""CASE
            |  WHEN (m - sx * 1000000 div n) < 0 THEN
            |    CASE WHEN $devSq > $bound THEN 'a' ELSE 'b' END
            |  ELSE CASE WHEN $devSq > $bound THEN 'd' ELSE 'c' END
            |END""".stripMargin).as("sym"))
        .groupBy(col("series"))
        .agg(max(col("n")).as("n_days"),
          count(lit(1)).as("n_segments"),
          expr("array_join(transform(array_sort(" +
            "collect_list(struct(g, sym))), s -> s.sym), '')")
            .as("sax_word"),
          expr("CAST(COUNT(DISTINCT sym) AS BIGINT)").as("n_symbols"))
        .orderBy(col("series"))
    },

    // Haar wavelet energy decomposition per series — three levels of
    // the unnormalized Haar DWT (details d = pair difference, approx
    // a = pair sum; incomplete tail pairs dropped at each level), the
    // multi-resolution energy readout next to the periodogram's
    // single-resolution one: e1 reads day-to-day noise, e2/e3
    // progressively coarser structure. Unnormalized transforms keep
    // EVERY coefficient an exact BIGINT (the classical 1/√2 scaling
    // would float every level), so the energies hash-compare; the
    // per-level scale factors (2, 4, 8 per coefficient) are the
    // documented contract. Plan: three chained series-keyed pair
    // folds (groupBy on position//2 — map-side combinable, each level
    // halves the frame), no window past the initial position index.
    QuerySpec.sql(
      "ts_haar_energy",
      """WITH cnts AS (
        |  SELECT event_type AS series,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |l0 AS (
        |  SELECT series,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY series ORDER BY day)
        |      - 1 AS BIGINT) AS p,
        |    x AS v
        |  FROM cnts),
        |l1 AS (
        |  SELECT series, p // 2 AS p,
        |    CAST(SUM(v) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN p % 2 = 0 THEN v ELSE -v END)
        |      AS BIGINT) AS d
        |  FROM l0 GROUP BY 1, 2 HAVING COUNT(*) = 2),
        |l2 AS (
        |  SELECT series, p // 2 AS p,
        |    CAST(SUM(a) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN p % 2 = 0 THEN a ELSE -a END)
        |      AS BIGINT) AS d
        |  FROM l1 GROUP BY 1, 2 HAVING COUNT(*) = 2),
        |l3 AS (
        |  SELECT series, p // 2 AS p,
        |    CAST(SUM(a) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN p % 2 = 0 THEN a ELSE -a END)
        |      AS BIGINT) AS d
        |  FROM l2 GROUP BY 1, 2 HAVING COUNT(*) = 2),
        |n AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM cnts GROUP BY 1)
        |SELECT n.series AS series, n.n_days,
        |  (SELECT CAST(COALESCE(SUM(d * d), 0) AS BIGINT) FROM l1
        |   WHERE l1.series = n.series) AS e1,
        |  (SELECT CAST(COALESCE(SUM(d * d), 0) AS BIGINT) FROM l2
        |   WHERE l2.series = n.series) AS e2,
        |  (SELECT CAST(COALESCE(SUM(d * d), 0) AS BIGINT) FROM l3
        |   WHERE l3.series = n.series) AS e3,
        |  (SELECT CAST(COALESCE(SUM(a * a), 0) AS BIGINT) FROM l3
        |   WHERE l3.series = n.series) AS ea3
        |FROM n ORDER BY series""".stripMargin) { (s, dir) =>
      val sw = Window.partitionBy(col("series")).orderBy(col("day"))
      val cnts = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
      val l0 = cnts.select(col("series"),
        (row_number().over(sw) - 1).cast("long").as("p"),
        col("x").as("v"))
      def level(in: DataFrame): DataFrame = in
        .groupBy(col("series"), expr("p div 2").as("p2"))
        .agg(sum(col("a")).as("na"),
          sum(when(col("p") % 2 === 0, col("a"))
            .otherwise(-col("a"))).as("d"),
          count(lit(1)).as("cnt"))
        .filter(col("cnt") === 2)
        .select(col("series"), col("p2").as("p"), col("na").as("a"),
          col("d"))
      val l1 = level(l0.withColumnRenamed("v", "a"))
      val l2 = level(l1)
      val l3 = level(l2)
      def energy(df: DataFrame, c: String, out: String) =
        df.groupBy(col("series"))
          .agg(sum(col(c) * col(c)).cast("long").as(out))
      val n = cnts.groupBy(col("series"))
        .agg(count(lit(1)).as("n_days"))
      n.join(energy(l1, "d", "e1"), Seq("series"), "left")
        .join(energy(l2, "d", "e2"), Seq("series"), "left")
        .join(energy(l3, "d", "e3"), Seq("series"), "left")
        .join(energy(l3, "a", "ea3"), Seq("series"), "left")
        .select(col("series"), col("n_days"),
          coalesce(col("e1"), lit(0L)).as("e1"),
          coalesce(col("e2"), lit(0L)).as("e2"),
          coalesce(col("e3"), lit(0L)).as("e3"),
          coalesce(col("ea3"), lit(0L)).as("ea3"))
        .orderBy(col("series"))
    },

    // Spectral entropy per series — how CONCENTRATED is the
    // periodogram? (White noise → flat spectrum → H near ln k; one
    // dominant cycle → H near 0.) Reads the ts_periodogram powers
    // (exact integers by the micro-quantized cos/sin discipline) and
    // folds Shannon entropy over the 10 harmonics with the one shared
    // micro-ln text; zero-power bins contribute exactly zero in both
    // engines. peak_k resolves by min-then-join-back. Plan: the
    // periodogram's one rollup + 10-harmonic grid, then a per-series
    // fold — bounded by |series|·10 everywhere past the rollup.
    QuerySpec.sql(
      "ts_spectral_entropy", {
        def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
          s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH d AS (SELECT event_type,
           |    CAST(date_trunc('day', ts) AS DATE) AS day,
           |    CAST(COUNT(*) AS BIGINT) AS x
           |  FROM events GROUP BY 1, 2),
           |c AS (SELECT MIN(day) AS d0,
           |    date_diff('day', MIN(day), MAX(day)) + 1 AS n FROM d),
           |tt AS (SELECT event_type, x,
           |    date_diff('day', c.d0, day) AS t, c.n FROM d, c),
           |kk AS (SELECT unnest(range(1, 11)) AS k),
           |terms AS (SELECT event_type, kk.k,
           |    x * CAST(CAST(cos(2 * pi() * kk.k * t / n)
           |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS xc,
           |    x * CAST(CAST(sin(2 * pi() * kk.k * t / n)
           |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS xs
           |  FROM tt, kk),
           |pw AS (SELECT event_type, k,
           |    CAST((CAST(SUM(xc) AS HUGEINT) * SUM(xc)
           |      + CAST(SUM(xs) AS HUGEINT) * SUM(xs))
           |      // 1000000000000 AS BIGINT) AS power
           |  FROM terms GROUP BY 1, 2),
           |h AS (SELECT event_type,
           |    CAST(SUM(power) AS BIGINT) AS tot,
           |    CAST(COUNT(*) FILTER (WHERE power > 0) AS BIGINT)
           |      AS n_active,
           |    CAST(COALESCE(SUM(power * ${lnm("power")})
           |      FILTER (WHERE power > 0), 0) AS BIGINT) AS s
           |  FROM pw GROUP BY 1),
           |pk AS (SELECT event_type, MAX(power) AS mp FROM pw
           |  GROUP BY 1),
           |peak AS (SELECT pw.event_type AS event_type,
           |    CAST(MIN(pw.k) AS BIGINT) AS peak_k
           |  FROM pw JOIN pk ON pk.event_type = pw.event_type
           |    AND pw.power = pk.mp
           |  GROUP BY 1)
           |SELECT h.event_type AS series, h.tot AS total_power,
           |  h.n_active,
           |  CAST(CASE WHEN h.tot > 0 THEN
           |    ${lnm("h.tot")} - h.s // h.tot END AS BIGINT)
           |    AS h_micro,
           |  CAST(CASE WHEN h.tot > 0 THEN
           |    (${lnm("h.tot")} - h.s // h.tot) * 1000000 // 2302585
           |    END AS BIGINT) AS h_norm_ppm,
           |  peak.peak_k
           |FROM h JOIN peak ON peak.event_type = h.event_type
           |ORDER BY series""".stripMargin
      }) { (s, dir) =>
      def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
        s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      val d = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val c = d.agg(min(col("day")).as("d0"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("n"))
      val pw = d.crossJoin(broadcast(c))
        .select(col("event_type"), col("x"),
          datediff(col("day"), col("d0")).as("t"), col("n"))
        .select(col("event_type"), col("x"), col("t"), col("n"),
          explode(sequence(lit(1), lit(10))).as("k"))
        .select(col("event_type"), col("k"),
          expr("""x * CAST(CAST(cos(2 * pi() * k * t / n)
                 |  AS DECIMAL(18,6)) * 1000000 AS BIGINT)"""
            .stripMargin).as("xc"),
          expr("""x * CAST(CAST(sin(2 * pi() * k * t / n)
                 |  AS DECIMAL(18,6)) * 1000000 AS BIGINT)"""
            .stripMargin).as("xs"))
        .groupBy(col("event_type"), col("k"))
        .agg(sum(col("xc")).as("sc"), sum(col("xs")).as("ss"))
        .select(col("event_type"), col("k"),
          expr("CAST((CAST(sc AS DECIMAL(38,0)) * sc " +
            "+ CAST(ss AS DECIMAL(38,0)) * ss) div 1000000000000 " +
            "AS BIGINT)").as("power"))
      val h = pw.groupBy(col("event_type"))
        .agg(sum(col("power")).cast("long").as("tot"),
          sum(when(col("power") > 0, 1L).otherwise(0L))
            .as("n_active"),
          coalesce(sum(when(col("power") > 0,
              col("power") * expr(lnm("power")))), lit(0L))
            .cast("long").as("s"))
      val pk = pw.groupBy(col("event_type"))
        .agg(max(col("power")).as("mp"))
      val peak = pw.join(pk, Seq("event_type"))
        .filter(col("power") === col("mp"))
        .groupBy(col("event_type"))
        .agg(min(col("k")).cast("long").as("peak_k"))
      h.join(peak, Seq("event_type"))
        .select(col("event_type").as("series"),
          col("tot").as("total_power"), col("n_active"),
          expr(s"CAST(CASE WHEN tot > 0 THEN ${lnm("tot")} " +
            "- s div tot END AS BIGINT)").as("h_micro"),
          expr(s"CAST(CASE WHEN tot > 0 THEN (${lnm("tot")} " +
            "- s div tot) * 1000000 div 2302585 END AS BIGINT)")
            .as("h_norm_ppm"),
          col("peak_k"))
        .orderBy(col("series"))
    },

    // Benjamini–Yekutieli FDR — the BH step-up's dependence-robust
    // sibling (valid under ARBITRARY p-value dependence, the honest
    // choice when the per-series tests share the same event stream):
    // thresholds shrink by the harmonic factor c(m) = Σ 1/i, carried
    // as the micro-quantized integer Σ 10⁶//i computed by the SAME
    // fold text in both engines, so every step-up comparison is an
    // exact cross-multiplied integer test (p_den = 2^n rides the
    // common-denominator shift trick shared with stats_fdr_bh). BH
    // rides along for the side-by-side readout. Plan: the shared sign
    // -test fold + PrefixSum global rank over the |series|-row test
    // table — no unpartitioned window, nothing row-scale past the
    // daily rollup.
    QuerySpec.sql(
      "stats_fdr_by",
      s"""WITH RECURSIVE $signTestCtes,
         |mm0 AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(MAX(n) AS BIGINT) AS nmax
         |  FROM sgn),
         |mm AS (
         |  SELECT m, nmax,
         |    CAST(list_reduce(list_transform(range(1, m + 1),
         |      i -> CAST(1000000 // i AS BIGINT)), (a, b) -> a + b)
         |      AS BIGINT) AS c_micros
         |  FROM mm0),
         |sc AS (
         |  SELECT s.series, s.n, s.k, s.p_num, s.p_den, mm.m,
         |    mm.nmax, mm.c_micros,
         |    s.p_num * (1::BIGINT << CAST(mm.nmax - s.n AS INT))
         |      AS p_scaled
         |  FROM sgn s, mm),
         |rk AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_scaled,
         |    series) AS BIGINT) AS rnk
         |  FROM sc),
         |th AS (
         |  SELECT
         |    COALESCE(MAX(CASE WHEN
         |      10 * m * CAST(c_micros AS HUGEINT) * p_scaled <=
         |      CAST(rnk AS HUGEINT) * 1000000
         |        * (1::BIGINT << CAST(nmax AS INT))
         |      THEN rnk END), 0) AS cutoff_by,
         |    COALESCE(MAX(CASE WHEN
         |      10 * m * CAST(p_scaled AS HUGEINT) <=
         |      CAST(rnk AS HUGEINT)
         |        * (1::BIGINT << CAST(nmax AS INT))
         |      THEN rnk END), 0) AS cutoff_bh
         |  FROM rk)
         |SELECT series, n, k, p_num, p_den, rnk AS rank, c_micros,
         |  rnk <= th.cutoff_by AS by_reject,
         |  rnk <= th.cutoff_bh AS bh_reject
         |FROM rk, th ORDER BY rank, series""".stripMargin) {
      (s, dir) =>
      import graft.functions.PrefixSum
      val sgn = Materialize.stable(signTest(s, dir))
      val mm = sgn.agg(count(lit(1)).cast("long").as("m"),
          max(col("n")).cast("long").as("nmax"))
        .withColumn("c_micros",
          expr("aggregate(sequence(1, CAST(m AS INT)), " +
            "CAST(0 AS BIGINT), (acc, i) -> acc + 1000000 div i)"))
      val sc = sgn.crossJoin(broadcast(mm))
        .withColumn("p_scaled", expr(
          "p_num * shiftleft(CAST(1 AS BIGINT), CAST(nmax - n AS INT))"))
      // stable'd: rk fans out to the two-cutoff fold AND the verdict
      // join (same two-consumer argument as stats_fdr_bh)
      val rk = Materialize.stable(PrefixSum.globalCumsum(sc,
        Seq(col("p_scaled"), col("series")), lit(1L), "rnk"))
      val th = rk.agg(
        coalesce(max(when(expr(
          "10 * m * CAST(c_micros AS DECIMAL(38,0)) * p_scaled <= " +
            "CAST(rnk AS DECIMAL(38,0)) * 1000000 * " +
            "shiftleft(CAST(1 AS BIGINT), CAST(nmax AS INT))"),
          col("rnk"))), lit(0L)).as("cutoff_by"),
        coalesce(max(when(expr(
          "10 * m * CAST(p_scaled AS DECIMAL(38,0)) <= " +
            "CAST(rnk AS DECIMAL(38,0)) * " +
            "shiftleft(CAST(1 AS BIGINT), CAST(nmax AS INT))"),
          col("rnk"))), lit(0L)).as("cutoff_bh"))
      rk.crossJoin(broadcast(th))
        .select(col("series"), col("n"), col("k"), col("p_num"),
          col("p_den"), col("rnk").as("rank"), col("c_micros"),
          (col("rnk") <= col("cutoff_by")).as("by_reject"),
          (col("rnk") <= col("cutoff_bh")).as("bh_reject"))
        .orderBy(col("rank"), col("series"))
    },

    // Hodges–Lehmann pseudo-median of the day-over-day deltas per
    // series — the robust location estimate paired with the sign
    // test (its confidence dual): the median of all Walsh averages
    // (dx_i + dx_j)/2, i ≤ j. Computed on the VALUE DOMAIN: distinct
    // delta values with multiplicities, pair mass c_i·c_j (or the
    // triangular c(c+1)/2 on the diagonal), so the pair surface is
    // distinct-values² — never rows² — and the estimate is the
    // smallest doubled-sum w whose cumulative mass reaches the lower
    // median, an exact integer (reported ×2 to avoid the halving
    // float). Plan: per-series value histogram → series-keyed
    // value-pair join → series-keyed cumulative window → one fold.
    QuerySpec.sql(
      "stats_hodges_lehmann",
      s"""WITH $seriesDiffCtes,
         |vc AS (
         |  SELECT series, dx AS v, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM dd WHERE dx IS NOT NULL GROUP BY 1, 2),
         |pa AS (
         |  SELECT a.series AS series, a.v + b.v AS w,
         |    CAST(CASE WHEN b.v > a.v THEN a.c * b.c
         |      ELSE a.c * (a.c + 1) // 2 END AS BIGINT) AS mass
         |  FROM vc a JOIN vc b
         |    ON b.series = a.series AND b.v >= a.v),
         |g AS (SELECT series, w, CAST(SUM(mass) AS BIGINT) AS mass
         |  FROM pa GROUP BY 1, 2),
         |cw AS (SELECT series, w, mass,
         |    CAST(SUM(mass) OVER (PARTITION BY series ORDER BY w)
         |      AS BIGINT) AS cm
         |  FROM g),
         |tot AS (SELECT series, CAST(SUM(mass) AS BIGINT) AS t
         |  FROM g GROUP BY 1),
         |ndf AS (SELECT series, CAST(SUM(c) AS BIGINT) AS nd
         |  FROM vc GROUP BY 1)
         |SELECT c.series AS series,
         |  MAX(ndf.nd) AS n_diffs,
         |  MAX(t.t) AS n_pairs,
         |  CAST(MIN(CASE WHEN c.cm * 2 >= t.t + 1 THEN c.w END)
         |    AS BIGINT) AS hl_x2,
         |  CAST(SIGN(MIN(CASE WHEN c.cm * 2 >= t.t + 1 THEN c.w
         |    END)) AS BIGINT) AS shift_sign
         |FROM cw c JOIN tot t ON t.series = c.series
         |JOIN ndf ON ndf.series = c.series
         |GROUP BY 1 ORDER BY series""".stripMargin) { (s, dir) =>
      val vc = seriesDiffs(s, dir)
        .filter(col("dx").isNotNull)
        .groupBy(col("series"), col("dx").as("v"))
        .agg(count(lit(1)).as("c"))
      val a = vc.select(col("series"), col("v").as("va"),
        col("c").as("ca"))
      val b = vc.select(col("series"), col("v").as("vb"),
        col("c").as("cb"))
      val g = a.join(b, Seq("series"))
        .filter(col("vb") >= col("va"))
        .select(col("series"), (col("va") + col("vb")).as("w"),
          expr("CAST(CASE WHEN vb > va THEN ca * cb " +
            "ELSE ca * (ca + 1) div 2 END AS BIGINT)").as("mass"))
        .groupBy(col("series"), col("w"))
        .agg(sum(col("mass")).cast("long").as("mass"))
      val cum = g.withColumn("cm",
        sum(col("mass")).over(Window.partitionBy(col("series"))
          .orderBy(col("w"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      val tot = g.groupBy(col("series"))
        .agg(sum(col("mass")).cast("long").as("t"))
      val nd = vc.groupBy(col("series"))
        .agg(sum(col("c")).cast("long").as("nd"))
      cum.join(tot, Seq("series")).join(nd, Seq("series"))
        .groupBy(col("series"))
        .agg(max(col("nd")).as("n_diffs"),
          max(col("t")).as("n_pairs"),
          min(when(col("cm") * 2 >= col("t") + 1, col("w")))
            .cast("long").as("hl_x2"),
          expr("CAST(SIGN(MIN(CASE WHEN cm * 2 >= t + 1 THEN w END))" +
            " AS BIGINT)").as("shift_sign"))
        .orderBy(col("series"))
    },

    // Exponentially-decayed volume per series — the recency-weighted
    // aggregate behind every trending-now / freshness ranking (decay
    // 0.9/day ≈ 6.6-day half-life; a slower 0.8/day column rides
    // along): weight(age) comes from a FIXED 30-entry micro-quantized
    // literal table shared verbatim with the oracle (the ndcg-
    // discount discipline), so the classically-float decayed sum is
    // an exact integer — and, because the weights are per-day
    // constants, the whole aggregate is one map-side-combinable fold.
    // Streaming twin: graft.streaming.DecayedVolumeStream — a bounded
    // 30-slot per-series ring (NOT a scalar ×0.9 fold: the table
    // truncates at age 29 and quantized weights don't compose),
    // frontier parity spec-pinned. Plan:
    // one daily rollup → broadcast age join → per-series fold; no
    // window.
    QuerySpec.sql(
      "ts_decayed_volume",
      s"""WITH cnts AS (
         |  SELECT event_type AS series,
         |    CAST(date_trunc('day', ts) AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |mx AS (SELECT MAX(day) AS d1 FROM cnts),
         |w AS (SELECT * FROM (VALUES $decayWeightsSql)
         |  AS t(age, w9, w8)),
         |j AS (
         |  SELECT c.series AS series, c.x, w.w9, w.w8
         |  FROM cnts c CROSS JOIN mx
         |  JOIN w ON w.age = date_diff('day', c.day, mx.d1))
         |SELECT series,
         |  CAST(COUNT(*) AS BIGINT) AS n_days,
         |  CAST(SUM(x) AS BIGINT) AS raw_total,
         |  CAST(SUM(x * w9) AS BIGINT) AS decayed9_micro,
         |  CAST(SUM(x * w8) AS BIGINT) AS decayed8_micro,
         |  CAST(SUM(x * w9) // 1000000 AS BIGINT) AS decayed9,
         |  CAST(SUM(x * w9) * 1000000 // SUM(x * 1000000) AS BIGINT)
         |    AS freshness_ppm
         |FROM j GROUP BY 1
         |ORDER BY series""".stripMargin) { (s, dir) =>
      import s.implicits._
      val cnts = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
      val mx = cnts.agg(max(col("day")).as("d1"))
      val w = decayWeights.toDF("age", "w9", "w8")
      cnts.crossJoin(broadcast(mx))
        .withColumn("age", datediff(col("d1"), col("day")))
        .join(broadcast(w), Seq("age"))
        .groupBy(col("series"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).cast("long").as("raw_total"),
          sum(col("x") * col("w9")).cast("long").as("decayed9_micro"),
          sum(col("x") * col("w8")).cast("long").as("decayed8_micro"))
        .select(col("series"), col("n_days"), col("raw_total"),
          col("decayed9_micro"), col("decayed8_micro"),
          expr("CAST(decayed9_micro div 1000000 AS BIGINT)")
            .as("decayed9"),
          expr("CAST(decayed9_micro * 1000000 div " +
            "(raw_total * 1000000) AS BIGINT)").as("freshness_ppm"))
        .orderBy(col("series"))
    },

    // ---- technical-analysis indicators over daily OHLC candles ----
    // The reference serves OHLC candles (exchanges.js:515-582) and
    // rolling rates; the classic indicator stack a market-data
    // consumer computes downstream (RSI / ATR / OBV / stochastics /
    // money flow) is the same shape: per-series day-keyed windows over
    // the candle table. All five gates share ONE daily-candle rollup
    // (cents-quantized OHLC + exact cents volume) and stay in BIGINT
    // throughout — SMA variants (Cutler RSI, Wilder-SMA ATR) rather
    // than the recursive EMAs, so every column is an exact integer
    // both engines agree on. Windows are series-keyed ROWS frames: at
    // 100 TB the candle table is one row per (series, day) — bounded
    // metadata, never a per-event surface.

    // Cutler's RSI-14: gain/loss sums over a 14-row series-keyed
    // window of close-to-close diffs; rsi in ppm by floor division
    // (flat 14-day window = the conventional 500000 midpoint).
    QuerySpec.sql(
      "ts_rsi",
      s"""WITH $dailyOhlcSql,
         |d AS (SELECT series, day, close_c,
         |  close_c - LAG(close_c) OVER
         |    (PARTITION BY series ORDER BY day) AS diff
         |  FROM daily),
         |w AS (SELECT series, day,
         |  CAST(SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END)
         |    OVER win AS BIGINT) AS gain_c,
         |  CAST(SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END)
         |    OVER win AS BIGINT) AS loss_c,
         |  CAST(COUNT(diff) OVER win AS BIGINT) AS nd
         |  FROM d WINDOW win AS (PARTITION BY series ORDER BY day
         |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT series, day, gain_c, loss_c,
         |  CAST(CASE WHEN gain_c + loss_c > 0
         |    THEN gain_c * 1000000 // (gain_c + loss_c)
         |    ELSE 500000 END AS BIGINT) AS rsi_ppm
         |FROM w WHERE nd = 14
         |ORDER BY series, day""".stripMargin) { (s, dir) =>
      val lagW = Window.partitionBy(col("series")).orderBy(col("day"))
      val w14 = lagW.rowsBetween(-13, 0)
      dailyOhlc(s, dir)
        .withColumn("diff",
          col("close_c") - lag(col("close_c"), 1).over(lagW))
        .withColumn("gain_c",
          sum(when(col("diff") > 0, col("diff")).otherwise(lit(0L)))
            .over(w14).cast("long"))
        .withColumn("loss_c",
          sum(when(col("diff") < 0, -col("diff")).otherwise(lit(0L)))
            .over(w14).cast("long"))
        .withColumn("nd", count(col("diff")).over(w14))
        .filter(col("nd") === 14)
        .select(col("series"), col("day"), col("gain_c"),
          col("loss_c"),
          when(col("gain_c") + col("loss_c") > 0,
            expr("gain_c * 1000000 div (gain_c + loss_c)"))
            .otherwise(lit(500000L)).cast("long").as("rsi_ppm"))
        .orderBy(col("series"), col("day"))
    },

    // ATR-14 (SMA form): true range folds yesterday's close into the
    // day's high/low span; the average is a floor-divided 14-row sum.
    QuerySpec.sql(
      "ts_atr",
      s"""WITH $dailyOhlcSql,
         |d AS (SELECT series, day, high_c, low_c,
         |  LAG(close_c) OVER (PARTITION BY series ORDER BY day) AS pc
         |  FROM daily),
         |t AS (SELECT series, day,
         |  CAST(CASE WHEN pc IS NULL THEN high_c - low_c
         |    ELSE GREATEST(high_c - low_c, ABS(high_c - pc),
         |      ABS(low_c - pc)) END AS BIGINT) AS tr_c
         |  FROM d),
         |w AS (SELECT series, day, tr_c,
         |  CAST(SUM(tr_c) OVER win AS BIGINT) AS str_c,
         |  CAST(COUNT(*) OVER win AS BIGINT) AS nw
         |  FROM t WINDOW win AS (PARTITION BY series ORDER BY day
         |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT series, day, tr_c,
         |  CAST(str_c // 14 AS BIGINT) AS atr_c
         |FROM w WHERE nw = 14
         |ORDER BY series, day""".stripMargin) { (s, dir) =>
      val lagW = Window.partitionBy(col("series")).orderBy(col("day"))
      val w14 = lagW.rowsBetween(-13, 0)
      dailyOhlc(s, dir)
        .withColumn("pc", lag(col("close_c"), 1).over(lagW))
        .withColumn("tr_c",
          when(col("pc").isNull, col("high_c") - col("low_c"))
            .otherwise(greatest(col("high_c") - col("low_c"),
              abs(col("high_c") - col("pc")),
              abs(col("low_c") - col("pc")))).cast("long"))
        .withColumn("str_c", sum(col("tr_c")).over(w14).cast("long"))
        .withColumn("nw", count(lit(1)).over(w14).cast("long"))
        .filter(col("nw") === 14)
        .select(col("series"), col("day"), col("tr_c"),
          expr("CAST(str_c div 14 AS BIGINT)").as("atr_c"))
        .orderBy(col("series"), col("day"))
    },

    // On-balance volume: signed cents-volume running sum — sign from
    // the close-to-close direction (first day contributes 0), the
    // cumulative window series-keyed.
    QuerySpec.sql(
      "ts_obv",
      s"""WITH $dailyOhlcSql,
         |d AS (SELECT series, day, close_c, vol_c,
         |  LAG(close_c) OVER (PARTITION BY series ORDER BY day) AS pc
         |  FROM daily),
         |sv AS (SELECT series, day, close_c,
         |  CAST(CASE WHEN pc IS NULL THEN 0
         |    WHEN close_c > pc THEN vol_c
         |    WHEN close_c < pc THEN -vol_c
         |    ELSE 0 END AS BIGINT) AS sv_c
         |  FROM d)
         |SELECT series, day, close_c,
         |  CAST(SUM(sv_c) OVER (PARTITION BY series ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS obv_c
         |FROM sv
         |ORDER BY series, day""".stripMargin) { (s, dir) =>
      val lagW = Window.partitionBy(col("series")).orderBy(col("day"))
      val cumW = lagW.rowsBetween(Window.unboundedPreceding, 0)
      dailyOhlc(s, dir)
        .withColumn("pc", lag(col("close_c"), 1).over(lagW))
        .withColumn("sv_c",
          when(col("pc").isNull, lit(0L))
            .when(col("close_c") > col("pc"), col("vol_c"))
            .when(col("close_c") < col("pc"), -col("vol_c"))
            .otherwise(lit(0L)).cast("long"))
        .select(col("series"), col("day"), col("close_c"),
          sum(col("sv_c")).over(cumW).cast("long").as("obv_c"))
        .orderBy(col("series"), col("day"))
    },

    // Stochastic oscillator: %K = position of the close inside the
    // 14-day high/low channel (ppm, floor-divided; flat channel =
    // midpoint), %D = 3-row SMA of %K (null until 3 %K rows exist).
    QuerySpec.sql(
      "ts_stochastic",
      s"""WITH $dailyOhlcSql,
         |w AS (SELECT series, day, close_c,
         |  CAST(MIN(low_c) OVER win AS BIGINT) AS ll,
         |  CAST(MAX(high_c) OVER win AS BIGINT) AS hh,
         |  CAST(COUNT(*) OVER win AS BIGINT) AS nw
         |  FROM daily WINDOW win AS (PARTITION BY series ORDER BY day
         |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
         |k AS (SELECT series, day,
         |  CAST(CASE WHEN hh > ll
         |    THEN (close_c - ll) * 1000000 // (hh - ll)
         |    ELSE 500000 END AS BIGINT) AS k_ppm
         |  FROM w WHERE nw = 14)
         |SELECT series, day, k_ppm,
         |  CAST(CASE WHEN COUNT(*) OVER w3 = 3
         |    THEN SUM(k_ppm) OVER w3 // 3 END AS BIGINT) AS d_ppm
         |FROM k WINDOW w3 AS (PARTITION BY series ORDER BY day
         |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         |ORDER BY series, day""".stripMargin) { (s, dir) =>
      val ordW = Window.partitionBy(col("series")).orderBy(col("day"))
      val w14 = ordW.rowsBetween(-13, 0)
      val w3 = ordW.rowsBetween(-2, 0)
      dailyOhlc(s, dir)
        .withColumn("ll", min(col("low_c")).over(w14).cast("long"))
        .withColumn("hh", max(col("high_c")).over(w14).cast("long"))
        .withColumn("nw", count(lit(1)).over(w14).cast("long"))
        .filter(col("nw") === 14)
        .select(col("series"), col("day"),
          when(col("hh") > col("ll"),
            expr("(close_c - ll) * 1000000 div (hh - ll)"))
            .otherwise(lit(500000L)).cast("long").as("k_ppm"))
        .withColumn("sk", sum(col("k_ppm")).over(w3).cast("long"))
        .withColumn("nk", count(lit(1)).over(w3).cast("long"))
        .select(col("series"), col("day"), col("k_ppm"),
          when(col("nk") === 3, expr("sk div 3"))
            .cast("long").as("d_ppm"))
        .orderBy(col("series"), col("day"))
    },

    // Chaikin money flow (20-day): the per-day money-flow volume is
    // an exact per-row truncating division (div ≡ //, toward zero —
    // mfv is SIGNED, |mfv| ≤ vol by construction, so this is not a
    // floor on negative days; a Python-// port would diverge),
    // folded against the volume sum in ppm. BIGINT-safe while a
    // series' 20-day cents volume stays under ~9.2e12 — the dsum
    // envelope; beyond that the multiplier column moves to
    // DECIMAL(38,0) like the XRPL IOU path.
    QuerySpec.sql(
      "ts_chaikin_mf",
      s"""WITH $dailyOhlcSql,
         |m AS (SELECT series, day, vol_c,
         |  CAST(CASE WHEN high_c > low_c
         |    THEN (vol_c * (2 * close_c - low_c - high_c))
         |      // (high_c - low_c)
         |    ELSE 0 END AS BIGINT) AS mfv_c
         |  FROM daily),
         |w AS (SELECT series, day,
         |  CAST(SUM(mfv_c) OVER win AS BIGINT) AS smfv_c,
         |  CAST(SUM(vol_c) OVER win AS BIGINT) AS svol_c,
         |  CAST(COUNT(*) OVER win AS BIGINT) AS nw
         |  FROM m WINDOW win AS (PARTITION BY series ORDER BY day
         |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         |SELECT series, day, smfv_c, svol_c,
         |  CAST(CASE WHEN svol_c > 0
         |    THEN smfv_c * 1000000 // svol_c END AS BIGINT) AS cmf_ppm
         |FROM w WHERE nw = 20
         |ORDER BY series, day""".stripMargin) { (s, dir) =>
      val ordW = Window.partitionBy(col("series")).orderBy(col("day"))
      val w20 = ordW.rowsBetween(-19, 0)
      dailyOhlc(s, dir)
        .withColumn("mfv_c",
          when(col("high_c") > col("low_c"),
            expr("(vol_c * (2 * close_c - low_c - high_c))" +
              " div (high_c - low_c)"))
            .otherwise(lit(0L)).cast("long"))
        .withColumn("smfv_c", sum(col("mfv_c")).over(w20).cast("long"))
        .withColumn("svol_c", sum(col("vol_c")).over(w20).cast("long"))
        .withColumn("nw", count(lit(1)).over(w20).cast("long"))
        .filter(col("nw") === 20)
        .select(col("series"), col("day"), col("smfv_c"),
          col("svol_c"),
          when(col("svol_c") > 0,
            expr("smfv_c * 1000000 div svol_c"))
            .cast("long").as("cmf_ppm"))
        .orderBy(col("series"), col("day"))
    },

    // Wilcoxon signed-rank (one-sample, per series): does the daily
    // step dx have zero median? The magnitude-aware sibling of
    // stats_sign_test on the SAME two-regime diff frame — zeros
    // dropped, |dx| midranked through the per-distinct-magnitude
    // histogram (series-keyed prefix window, the mannwhitney ×2-rank
    // discipline), W⁺ and the tie-corrected variance exact integers:
    // var48 = 2n(n+1)(2n+1) − Σ(t³−t) (= 48·Var, provably > 0 for
    // n ≥ 1), z floored to micro through the shared-text float
    // expression (sqrt/÷ correctly rounded in the same order both
    // engines). BIGINT-safe to n ≈ 1.6e6 nonzero days per series —
    // a 4,000-year daily calendar; the n³ terms error loudly past it
    // (ANSI overflow), never wrap.
    QuerySpec.sql(
      "stats_wilcoxon_signed_rank",
      s"""WITH $seriesDiffCtes,
         |h AS (
         |  SELECT series, ABS(dx) AS a,
         |    CAST(COUNT(*) AS BIGINT) AS c,
         |    CAST(COUNT(*) FILTER (WHERE dx > 0) AS BIGINT) AS cpos
         |  FROM dd WHERE dx IS NOT NULL AND dx <> 0
         |  GROUP BY 1, 2),
         |r AS (SELECT series, a, c, cpos,
         |    COALESCE(SUM(c) OVER (PARTITION BY series ORDER BY a
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumb
         |  FROM h),
         |agg AS (SELECT series,
         |    CAST(SUM(c) AS BIGINT) AS n,
         |    CAST(SUM(cpos * (2 * cumb + c + 1)) AS BIGINT)
         |      AS wplus_x2,
         |    CAST(SUM(c * c * c - c) AS BIGINT) AS ties
         |  FROM r GROUP BY 1),
         |v AS (SELECT series, n, wplus_x2,
         |    CAST(2 * n * (n + 1) * (2 * n + 1) - ties AS BIGINT)
         |      AS var48,
         |    CAST(wplus_x2 - n * (n + 1) // 2 AS BIGINT) AS dev_x2
         |  FROM agg)
         |SELECT series, n, wplus_x2, var48,
         |  CAST(FLOOR(dev_x2 / 2.0 / sqrt(var48 / 48.0) * 1000000)
         |    AS BIGINT) AS z_micro,
         |  CASE WHEN ABS(CAST(FLOOR(dev_x2 / 2.0 / sqrt(var48 / 48.0)
         |      * 1000000) AS BIGINT)) > 1959964
         |    THEN 'shifted' ELSE 'no_shift' END AS verdict
         |FROM v ORDER BY series""".stripMargin) { (s, dir) =>
      val h = seriesDiffs(s, dir)
        .filter(col("dx").isNotNull && col("dx") =!= 0)
        .groupBy(col("series"), abs(col("dx")).as("a"))
        .agg(count(lit(1)).as("c"),
          sum(when(col("dx") > 0, 1L).otherwise(0L)).as("cpos"))
      val w = Window.partitionBy(col("series")).orderBy(col("a"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val agg = h
        .withColumn("cumb", coalesce(sum(col("c")).over(w), lit(0L)))
        .groupBy(col("series"))
        .agg(sum(col("c")).cast("long").as("n"),
          sum(col("cpos") * (lit(2) * col("cumb") + col("c") + lit(1)))
            .cast("long").as("wplus_x2"),
          sum(col("c") * col("c") * col("c") - col("c"))
            .cast("long").as("ties"))
      val zExpr = "FLOOR(dev_x2 / 2.0 / sqrt(var48 / 48.0) * 1000000)"
      agg
        .withColumn("var48",
          expr("CAST(2 * n * (n + 1) * (2 * n + 1) - ties AS BIGINT)"))
        .withColumn("dev_x2",
          expr("CAST(wplus_x2 - n * (n + 1) div 2 AS BIGINT)"))
        .select(col("series"), col("n"), col("wplus_x2"),
          col("var48"),
          expr(s"CAST($zExpr AS BIGINT)").as("z_micro"),
          expr(s"CASE WHEN ABS(CAST($zExpr AS BIGINT)) > 1959964 " +
            "THEN 'shifted' ELSE 'no_shift' END").as("verdict"))
        .orderBy(col("series"))
    },

    // Parkinson range volatility per series: σ²_P = mean(ln(H/L)²) /
    // (4·ln2) over the daily candles — the estimator that extracts
    // ~5× more information per day than close-to-close returns. Each
    // ln is micro-quantized through the ONE shared expression (the
    // entropy-rate discipline), so ln(H/L) = lnm(H) − lnm(L) is an
    // exact micro integer, its square exact pico, and the 4·ln2
    // constant a fixed micro literal (2772589) — one floor division
    // through DECIMAL(38,0)/HUGEINT closes the variance. Plan: the
    // shared candle rollup → per-series fold; no window at all.
    QuerySpec.sql(
      "ts_parkinson_vol", {
        def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
          s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH $dailyOhlcSql,
           |l AS (SELECT series, day,
           |    ${lnm("high_c")} - ${lnm("low_c")} AS hl_micro
           |  FROM daily WHERE low_c > 0),
           |a AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n_days,
           |    CAST(SUM(hl_micro * hl_micro) AS BIGINT) AS ssq_pico
           |  FROM l GROUP BY 1)
           |SELECT series, n_days, ssq_pico,
           |  CAST(CAST(ssq_pico AS HUGEINT) * 1000000
           |    // (2772589 * CAST(n_days AS HUGEINT)) AS BIGINT)
           |    AS park_var_pico
           |FROM a ORDER BY series""".stripMargin
      }) { (s, dir) =>
      val lnm = (e: String) => s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
        s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      dailyOhlc(s, dir)
        .filter(col("low_c") > 0)
        .select(col("series"),
          (expr(lnm("high_c")) - expr(lnm("low_c"))).as("hl_micro"))
        .groupBy(col("series"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("hl_micro") * col("hl_micro")).cast("long")
            .as("ssq_pico"))
        .select(col("series"), col("n_days"), col("ssq_pico"),
          expr("CAST(CAST(ssq_pico AS DECIMAL(38,0)) * 1000000 " +
            "div (2772589 * CAST(n_days AS DECIMAL(38,0))) " +
            "AS BIGINT)").as("park_var_pico"))
        .orderBy(col("series"))
    },

    // Garman–Klass OHLC volatility per series: per day
    // 0.5·ln(H/L)² − (2ln2−1)·ln(C/O)², folded to the series mean.
    // Same micro-ln discipline as Parkinson; the (2ln2−1) constant is
    // the fixed micro literal 386294, and the per-day cross term
    // rides DECIMAL(38,0)/HUGEINT so pico² intermediates never
    // overflow. A day can contribute negatively (the classic
    // estimator's known quirk) — for signed numerators the shared
    // division is TRUNCATING (div ≡ //, toward zero; verified
    // −7//2 = −3 in both engines), not floor — a Python-// port
    // would diverge on negative operands.
    QuerySpec.sql(
      "ts_garman_klass_vol", {
        def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
          s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH $dailyOhlcSql,
           |l AS (SELECT series, day,
           |    ${lnm("high_c")} - ${lnm("low_c")} AS hl_micro,
           |    ${lnm("close_c")} - ${lnm("open_c")} AS co_micro
           |  FROM daily WHERE low_c > 0 AND open_c > 0),
           |g AS (SELECT series,
           |    CAST(hl_micro * hl_micro // 2
           |      - CAST(co_micro AS HUGEINT) * co_micro * 386294
           |        // 1000000 AS BIGINT) AS gk_pico
           |  FROM l),
           |a AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n_days,
           |    CAST(SUM(gk_pico) AS BIGINT) AS gk_sum_pico
           |  FROM g GROUP BY 1)
           |SELECT series, n_days, gk_sum_pico,
           |  CAST(gk_sum_pico // n_days AS BIGINT) AS gk_var_pico
           |FROM a ORDER BY series""".stripMargin
      }) { (s, dir) =>
      val lnm = (e: String) => s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
        s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      dailyOhlc(s, dir)
        .filter(col("low_c") > 0 && col("open_c") > 0)
        .select(col("series"),
          (expr(lnm("high_c")) - expr(lnm("low_c"))).as("hl_micro"),
          (expr(lnm("close_c")) - expr(lnm("open_c"))).as("co_micro"))
        .select(col("series"),
          expr("CAST(hl_micro * hl_micro div 2 " +
            "- CAST(co_micro AS DECIMAL(38,0)) * co_micro * 386294 " +
            "div 1000000 AS BIGINT)").as("gk_pico"))
        .groupBy(col("series"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("gk_pico")).cast("long").as("gk_sum_pico"))
        .select(col("series"), col("n_days"), col("gk_sum_pico"),
          expr("CAST(gk_sum_pico div n_days AS BIGINT)")
            .as("gk_var_pico"))
        .orderBy(col("series"))
    },

    // Durbin–Watson first-order autocorrelation statistic per series
    // on the two-regime daily frame: d = Σ(Δy)² / Σ(y−ȳ)², made an
    // EXACT integer rational by multiplying both sides by n²
    // (num = n²·Σ(Δy)², den = Σ(n·y − S)²), reported in milli
    // (0–4000; ≈2000 = no autocorrelation, the trending cum_users
    // regime reads near 0). All products ride DECIMAL(38,0)/HUGEINT;
    // the only window is the series-keyed LAG the diff frame already
    // uses. Constant series → den 0 → NULL, guarded in both engines.
    QuerySpec.sql(
      "ts_durbin_watson",
      s"""WITH $seriesDiffCtes,
         |sq AS (SELECT series,
         |    CAST(SUM(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sdd
         |  FROM dd WHERE dx IS NOT NULL GROUP BY 1),
         |st AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
         |  FROM daily GROUP BY 1)
         |SELECT st.series AS series, st.n AS n,
         |  CAST(sq.sdd AS BIGINT) AS sum_sq_diff,
         |  CAST(CASE WHEN st.n * sxx - CAST(sx AS HUGEINT) * sx > 0
         |    THEN CAST(st.n AS HUGEINT) * st.n * sq.sdd * 1000
         |      // (st.n * (st.n * sxx - CAST(sx AS HUGEINT) * sx))
         |    END AS BIGINT) AS dw_milli
         |FROM st JOIN sq ON sq.series = st.series
         |ORDER BY series""".stripMargin) { (s, dir) =>
      val sq = seriesDiffs(s, dir)
        .filter(col("dx").isNotNull)
        .groupBy(col("series"))
        .agg(sum(expr("CAST(dx AS DECIMAL(38,0)) * dx"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("sdd"))
      val st = seriesDaily(s, dir)
        .groupBy(col("series"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .as("sxx"))
      st.join(sq, Seq("series"))
        .select(col("series"), col("n"),
          col("sdd").cast("long").as("sum_sq_diff"),
          expr("CAST(CASE WHEN n * sxx - CAST(sx AS DECIMAL(38,0)) " +
            "* sx > 0 THEN CAST(n AS DECIMAL(38,0)) * n * sdd * 1000" +
            " div (n * (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx)) " +
            "END AS BIGINT)").as("dw_milli"))
        .orderBy(col("series"))
    },

    // Transition latency — the process-mining bottleneck readout
    // beside events_transitions: for each (from, to) event-type edge,
    // the p50/p90 of the in-user gap. Gaps quantize to whole seconds
    // (one floor division — the histogram key), so the quantile
    // selection runs over a per-pair SECONDS histogram (bounded by
    // the time span, never row-scale) with one pair-keyed prefix
    // window; p50/p90 pick by exact integer rank thresholds
    // (2·cum ≥ n+1 / 10·cum ≥ 9n — ceil semantics shared verbatim).
    // One user_id shuffle + one hash aggregate is all the row-scale
    // work.
    QuerySpec.sql(
      "events_transition_latency",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type
        |  FROM events),
        |p AS (SELECT event_type AS from_type, us,
        |    LEAD(event_type) OVER w AS to_type,
        |    LEAD(us) OVER w AS to_us
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY us, event_id)),
        |h AS (SELECT from_type, to_type,
        |    CAST((to_us - us) // 1000000 AS BIGINT) AS gap_s,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2, 3),
        |r AS (SELECT from_type, to_type, gap_s, c,
        |    CAST(SUM(c) OVER (PARTITION BY from_type, to_type
        |      ORDER BY gap_s ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS BIGINT) AS cum
        |  FROM h),
        |n AS (SELECT from_type, to_type, CAST(SUM(c) AS BIGINT) AS n
        |  FROM h GROUP BY 1, 2)
        |SELECT r.from_type AS from_type, r.to_type AS to_type,
        |  MAX(n.n) AS n_trans,
        |  CAST(MIN(CASE WHEN 2 * r.cum >= n.n + 1 THEN r.gap_s END)
        |    AS BIGINT) AS p50_gap_s,
        |  CAST(MIN(CASE WHEN 10 * r.cum >= 9 * n.n THEN r.gap_s END)
        |    AS BIGINT) AS p90_gap_s
        |FROM r JOIN n ON n.from_type = r.from_type
        |  AND n.to_type = r.to_type
        |GROUP BY 1, 2
        |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val h = events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .withColumn("to_us", lead(col("us"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"),
          expr("CAST((to_us - us) div 1000000 AS BIGINT)").as("gap_s"))
        .agg(count(lit(1)).as("c"))
      val cumW = Window.partitionBy(col("from_type"), col("to_type"))
        .orderBy(col("gap_s"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val r = h.withColumn("cum", sum(col("c")).over(cumW).cast("long"))
      val n = h.groupBy(col("from_type"), col("to_type"))
        .agg(sum(col("c")).cast("long").as("n"))
      r.join(n, Seq("from_type", "to_type"))
        .groupBy(col("from_type"), col("to_type"))
        .agg(max(col("n")).as("n_trans"),
          min(when(lit(2) * col("cum") >= col("n") + 1, col("gap_s")))
            .cast("long").as("p50_gap_s"),
          min(when(lit(10) * col("cum") >= lit(9) * col("n"),
            col("gap_s"))).cast("long").as("p90_gap_s"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Kaufman efficiency ratio (10-day): |net 9-day move| over the
    // sum of the 9 daily |moves| — 10⁶ = perfectly trending, → 0 =
    // pure chop. The trend-regime detector adaptive averages key on,
    // exact in ppm off the cents close series: one series-keyed LAG
    // pair + one 9-row window sum.
    QuerySpec.sql(
      "ts_kaufman_er",
      s"""WITH $dailyOhlcSql,
         |d AS (SELECT series, day, close_c,
         |    close_c - LAG(close_c) OVER w AS diff,
         |    close_c - LAG(close_c, 9) OVER w AS net9
         |  FROM daily WINDOW w AS (PARTITION BY series ORDER BY day)),
         |v AS (SELECT series, day, net9,
         |    CAST(SUM(ABS(diff)) OVER win AS BIGINT) AS vol9,
         |    CAST(COUNT(diff) OVER win AS BIGINT) AS nd
         |  FROM d WINDOW win AS (PARTITION BY series ORDER BY day
         |    ROWS BETWEEN 8 PRECEDING AND CURRENT ROW))
         |SELECT series, day, CAST(net9 AS BIGINT) AS net9_c,
         |  vol9 AS vol9_c,
         |  CAST(CASE WHEN vol9 > 0
         |    THEN ABS(net9) * 1000000 // vol9 END AS BIGINT) AS er_ppm
         |FROM v WHERE nd = 9
         |ORDER BY series, day""".stripMargin) { (s, dir) =>
      val lagW = Window.partitionBy(col("series")).orderBy(col("day"))
      val w9 = lagW.rowsBetween(-8, 0)
      dailyOhlc(s, dir)
        .withColumn("diff",
          col("close_c") - lag(col("close_c"), 1).over(lagW))
        .withColumn("net9",
          col("close_c") - lag(col("close_c"), 9).over(lagW))
        .withColumn("vol9", sum(abs(col("diff"))).over(w9).cast("long"))
        .withColumn("nd", count(col("diff")).over(w9).cast("long"))
        .filter(col("nd") === 9)
        .select(col("series"), col("day"),
          col("net9").cast("long").as("net9_c"),
          col("vol9").as("vol9_c"),
          when(col("vol9") > 0,
            expr("ABS(net9) * 1000000 div vol9"))
            .cast("long").as("er_ppm"))
        .orderBy(col("series"), col("day"))
    },

    // Amihud illiquidity per series: mean of the daily
    // |return| / volume price-impact ratio — how many pico units of
    // relative move one cent of volume buys. Each day's ratio is one
    // exact floor division (|Δclose|·10¹² // (prev_close·vol), the
    // 10¹² numerator through HUGEINT/DECIMAL(38,0)), then a per-series
    // mean and max. One keyed LAG + one fold.
    QuerySpec.sql(
      "ts_amihud_illiq",
      s"""WITH $dailyOhlcSql,
         |d AS (SELECT series, day, close_c, vol_c,
         |    LAG(close_c) OVER (PARTITION BY series ORDER BY day)
         |      AS pc
         |  FROM daily),
         |r AS (SELECT series,
         |    CASE WHEN ABS(close_c - pc) >
         |        9000000 * (pc * CAST(vol_c AS HUGEINT))
         |      THEN CAST(error('ts_amihud_illiq: price-impact ratio'
         |        || ' exceeds the int64 pico envelope; rescale the'
         |        || ' quote') AS BIGINT)
         |      ELSE
         |    CAST(ABS(close_c - pc) * CAST(1000000000000 AS HUGEINT)
         |      // (pc * CAST(vol_c AS HUGEINT)) AS BIGINT) END AS ratio
         |  FROM d WHERE pc IS NOT NULL AND pc > 0 AND vol_c > 0)
         |SELECT series, CAST(COUNT(*) AS BIGINT) AS n_days,
         |  CAST(SUM(ratio) // COUNT(*) AS BIGINT) AS illiq_pico,
         |  CAST(MAX(ratio) AS BIGINT) AS max_illiq_pico
         |FROM r GROUP BY 1
         |ORDER BY series""".stripMargin) { (s, dir) =>
      val lagW = Window.partitionBy(col("series")).orderBy(col("day"))
      dailyOhlc(s, dir)
        .withColumn("pc", lag(col("close_c"), 1).over(lagW))
        .filter(col("pc").isNotNull && col("pc") > 0 &&
          col("vol_c") > 0)
        .select(col("series"),
          // Pre-div envelope guard (r16 div-wrap audit): the divisor
          // here is a DATA VALUE (pc·vol can be one cent²), so unlike
          // the row-count-bounded ratio gates the pico quotient is
          // reachable past 2⁶³ by value scale alone — where Spark's
          // decimal div WRAPS silently and the oracle's HUGEINT→
          // BIGINT cast errors. |Δ| > 9e6·pc·vol bounds the quotient
          // under 9e18 (conservative vs the 9.223e18 wrap point) and
          // is mirrored verbatim as the oracle's error() branch.
          expr("CAST(CASE WHEN ABS(close_c - pc) > " +
            "9000000 * (pc * CAST(vol_c AS DECIMAL(38,0)))" +
            " THEN raise_error(concat('ts_amihud_illiq: price-impact" +
            " ratio exceeds the int64 pico envelope; rescale the" +
            " quote'))" +
            " ELSE ABS(close_c - pc) " +
            "* CAST(1000000000000 AS DECIMAL(38,0)) " +
            "div (pc * CAST(vol_c AS DECIMAL(38,0))) END AS BIGINT)")
            .as("ratio"))
        .groupBy(col("series"))
        .agg(count(lit(1)).as("n_days"),
          expr("CAST(SUM(ratio) div COUNT(*) AS BIGINT)")
            .as("illiq_pico"),
          max(col("ratio")).cast("long").as("max_illiq_pico"))
        .orderBy(col("series"))
    },

    // Bartlett's test of equal variances across the event-type groups
    // — the normal-theory sibling of stats_levene_bf (Brown–Forsythe
    // is robust; Bartlett is the more powerful test when normality
    // holds, and the pair is the standard cross-check). Group
    // variances fold as exact integers over cents, then are reduced
    // to the INT64-SAFE rational q_i = (n_iΣx²−S_i²) // n_i ≈
    // (n_i−1)s²_i BEFORE any ln — every micro-ln argument (q_i,
    // pnum = Σq_i, n_i−1, N−k) is an int64, never a HUGEINT/
    // DECIMAL(38,0), because 128-bit→DOUBLE is not correctly rounded
    // in DuckDB (the feat_corr_matrix rule; the raw numerator is
    // already 54 bits at sf0.1 and grows ~n²  while q_i grows ~n).
    // T = (N−k)·ln(pnum/(N−k)) − Σ(n_i−1)·ln(q_i/(n_i−1)) as exact
    // micro integers; the q envelope (q_i ≤ 10¹⁸, so Σq over the
    // 5-type events schema stays < 2⁶³) fails LOUDLY and
    // symmetrically in both engines (error()/raise_error), never
    // silently. The Bartlett correction C folds exactly in nano;
    // χ² = T·10⁹ // C_nano. Plan: one per-group fold + one k-row
    // broadcast fold — no window.
    QuerySpec.sql(
      "stats_bartlett", {
        def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
          s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH g AS (
           |  SELECT event_type,
           |    CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           |      AS sx,
           |    CAST(SUM(CAST(CAST(round(value * 100) AS BIGINT)
           |      AS HUGEINT) * CAST(round(value * 100) AS BIGINT))
           |      AS HUGEINT) AS sxx
           |  FROM events GROUP BY 1),
           |v AS (
           |  SELECT event_type, n,
           |    CASE WHEN (n * sxx - CAST(sx AS HUGEINT) * sx) // n
           |        > CAST(1000000000000000000 AS HUGEINT)
           |      THEN CAST(error('stats_bartlett: variance numerator'
           |        || ' // n exceeds the int64 micro-ln envelope;'
           |        || ' coarsen the cents quantization') AS BIGINT)
           |      ELSE CAST((n * sxx - CAST(sx AS HUGEINT) * sx) // n
           |        AS BIGINT) END AS q
           |  FROM g WHERE n >= 2),
           |p AS (
           |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
           |    CAST(COUNT(*) AS BIGINT) AS k,
           |    CAST(SUM(q) AS BIGINT) AS pnum,
           |    CAST(SUM((n - 1) * (${lnm("q")} - ${lnm("n - 1")}))
           |      AS BIGINT) AS sum_ln,
           |    CAST(SUM(1000000000 // (n - 1)) AS BIGINT) AS inv_sum
           |  FROM v)
           |SELECT nn AS n_total, k AS n_groups,
           |  CAST((nn - k) * (${lnm("pnum")} - ${lnm("nn - k")})
           |    - sum_ln AS BIGINT) AS t_micro,
           |  CAST(1000000000 + (inv_sum - 1000000000 // (nn - k))
           |    // (3 * (k - 1)) AS BIGINT) AS c_nano,
           |  CAST(((nn - k) * (${lnm("pnum")} - ${lnm("nn - k")})
           |      - sum_ln) * 1000000000
           |    // (1000000000 + (inv_sum - 1000000000 // (nn - k))
           |      // (3 * (k - 1))) AS BIGINT) AS chi2_micro
           |FROM p""".stripMargin
      }) { (s, dir) =>
      val lnm = (e: String) => s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
        s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val g = events(s, dir)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("xc"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("xc")).cast("long").as("sx"),
          sum(expr("CAST(xc AS DECIMAL(38,0)) * xc")).cast(d38)
            .as("sxx"))
      val v = g.filter(col("n") >= 2)
        .withColumn("num",
          expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx").cast(d38))
        .select(col("event_type"), col("n"),
          // Envelope check on num BEFORE the div (r16, same fix as
          // stats_tukey_hsd): ANSI makes the old IS NULL arm dead and
          // Spark's decimal div WRAPS its long quotient past 2⁶³, so
          // a post-div > 1e18 check missed wraps landing low. The
          // pure decimal compare num > n·10¹⁸ enforces the quotient
          // envelope totally, mirroring the oracle's error() branch.
          expr(
            """CASE WHEN num >
              |    CAST(n AS DECIMAL(38,0)) * 1000000000000000000
              |  THEN raise_error(concat('stats_bartlett: variance ',
              |    'numerator div n exceeds the int64 micro-ln ',
              |    'envelope; coarsen the cents quantization'))
              |  ELSE num div n END""".stripMargin).as("q"))
      val p = v.agg(
        sum(col("n")).cast("long").as("nn"),
        count(lit(1)).as("k"),
        sum(col("q")).cast("long").as("pnum"),
        sum(expr(s"(n - 1) * (${lnm("q")} - ${lnm("n - 1")})"))
          .cast("long").as("sum_ln"),
        sum(expr("1000000000 div (n - 1)")).cast("long").as("inv_sum"))
      val t = s"(nn - k) * (${lnm("pnum")} - ${lnm("nn - k")}) - sum_ln"
      val c = "1000000000 + (inv_sum - 1000000000 div (nn - k)) " +
        "div (3 * (k - 1))"
      p.select(col("nn").as("n_total"), col("k").as("n_groups"),
        expr(s"CAST($t AS BIGINT)").as("t_micro"),
        expr(s"CAST($c AS BIGINT)").as("c_nano"),
        expr(s"CAST(($t) * 1000000000 div ($c) AS BIGINT)")
          .as("chi2_micro"))
    },

    // Cochran–Armitage trend test: does the fulfilled-order rate move
    // MONOTONICALLY with order priority (dose = the priority digit
    // 1–5)? The dose-response test an A/B/n ladder reads instead of
    // the omnibus chi-square. Entirely closed-form over the 5-row
    // dose table: T = Σw(xN − nX), z² = T²N² / (X(N−X)(NΣw²n −
    // (Σwn)²)) — every product in DECIMAL(38,0)/HUGEINT, one floor
    // division to micro, verdict against the exact χ²(1) 5% critical
    // micro literal. One orders fold; no join, no window.
    QuerySpec.sql(
      "stats_cochran_armitage",
      """WITH d AS (
        |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |a0 AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(x) AS BIGINT) AS xx FROM d),
        |a AS (SELECT a0.nn AS nn, a0.xx AS xx,
        |    CAST(SUM(w * n) AS BIGINT) AS swn,
        |    CAST(SUM(w * w * n) AS BIGINT) AS sw2n,
        |    CAST(SUM(CAST(w AS HUGEINT) * (x * CAST(a0.nn AS HUGEINT)
        |      - n * CAST(a0.xx AS HUGEINT))) AS HUGEINT) AS t
        |  FROM d CROSS JOIN a0 GROUP BY 1, 2)
        |SELECT nn AS n_total, xx AS n_success,
        |  CAST(t AS BIGINT) AS t_stat,
        |  CAST(CASE WHEN xx > 0 AND xx < nn
        |      AND nn * CAST(sw2n AS HUGEINT) - CAST(swn AS HUGEINT)
        |        * swn > 0
        |    THEN t * t * 1000000
        |      // (CAST(xx AS HUGEINT) * (nn - xx)
        |        * (nn * CAST(sw2n AS HUGEINT)
        |          - CAST(swn AS HUGEINT) * swn) // (CAST(nn AS
        |            HUGEINT) * nn))
        |    END AS BIGINT) AS z2_micro,
        |  CASE WHEN CAST(CASE WHEN xx > 0 AND xx < nn
        |      AND nn * CAST(sw2n AS HUGEINT) - CAST(swn AS HUGEINT)
        |        * swn > 0
        |    THEN t * t * 1000000
        |      // (CAST(xx AS HUGEINT) * (nn - xx)
        |        * (nn * CAST(sw2n AS HUGEINT)
        |          - CAST(swn AS HUGEINT) * swn) // (CAST(nn AS
        |            HUGEINT) * nn))
        |    END AS BIGINT) > 3841459 THEN 'trend'
        |    ELSE 'no_trend' END AS verdict
        |FROM a""".stripMargin) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val d = Tables(s, dir, "orders")
        .groupBy(expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)")
          .as("w"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .cast("long").as("x"))
      // the 5-row dose table folds on the driver-free scalar path:
      // totals as window-free second fold via crossJoin(broadcast)
      val tot = d.agg(sum(col("n")).cast("long").as("nn"),
        sum(col("x")).cast("long").as("xx"))
      val a = d.crossJoin(broadcast(tot))
        .agg(max(col("nn")).as("nn"), max(col("xx")).as("xx"),
          sum(col("w") * col("n")).cast("long").as("swn"),
          sum(col("w") * col("w") * col("n")).cast("long").as("sw2n"),
          sum(expr("CAST(w AS DECIMAL(38,0)) * " +
            "(x * CAST(nn AS DECIMAL(38,0)) - " +
            "n * CAST(xx AS DECIMAL(38,0)))")).cast(d38).as("t"))
      val z2 = "CASE WHEN xx > 0 AND xx < nn AND nn * " +
        "CAST(sw2n AS DECIMAL(38,0)) - CAST(swn AS DECIMAL(38,0)) " +
        "* swn > 0 THEN t * t * 1000000 " +
        "div (CAST(xx AS DECIMAL(38,0)) * (nn - xx) " +
        "* (nn * CAST(sw2n AS DECIMAL(38,0)) " +
        "- CAST(swn AS DECIMAL(38,0)) * swn) " +
        "div (CAST(nn AS DECIMAL(38,0)) * nn)) END"
      a.select(col("nn").as("n_total"), col("xx").as("n_success"),
        col("t").cast("long").as("t_stat"),
        expr(s"CAST($z2 AS BIGINT)").as("z2_micro"),
        expr(s"CASE WHEN CAST($z2 AS BIGINT) > 3841459 " +
          "THEN 'trend' ELSE 'no_trend' END").as("verdict"))
    },

    // Theil's uncertainty coefficient U(type | day-of-week) — the
    // ASYMMETRIC categorical-association measure beside the symmetric
    // stats_cramers_v: what fraction of event-type entropy does
    // knowing the weekday remove? (Directionality is the point: U is
    // a proper "how predictable is X from Y" readout; V is not.)
    // N·H(X) and N·H(X|Y) fold as exact micro integers through the
    // ONE shared micro-ln over the |types|×7 contingency counts
    // (DECIMAL(38,0)/HUGEINT products, the c·ln c discipline of
    // text_entropy_rate); U is one ppm floor division. Plan: one
    // contingency hash fold + two marginal folds, no window.
    QuerySpec.sql(
      "stats_theil_u", {
        def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
          s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH c AS (
           |  SELECT event_type AS x,
           |    CAST(dayofweek(ts) AS BIGINT) AS y,
           |    CAST(COUNT(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2),
           |mx AS (SELECT x, CAST(SUM(n) AS BIGINT) AS c FROM c
           |  GROUP BY 1),
           |my AS (SELECT y, CAST(SUM(n) AS BIGINT) AS c FROM c
           |  GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
           |hx AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * ${lnm("c")})
           |    AS HUGEINT) AS sx FROM mx),
           |hy AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * ${lnm("c")})
           |    AS HUGEINT) AS sy FROM my),
           |hxy AS (SELECT CAST(SUM(CAST(n AS HUGEINT) * ${lnm("n")})
           |    AS HUGEINT) AS sxy FROM c)
           |SELECT nn AS n_total,
           |  CAST((CAST(nn AS HUGEINT) * ${lnm("nn")} - sx) // nn
           |    AS BIGINT) AS hx_micro,
           |  CAST((sy - sxy) // nn AS BIGINT) AS hx_given_y_micro,
           |  CAST((CAST(nn AS HUGEINT) * ${lnm("nn")} - sx
           |      - (sy - sxy)) * 1000000
           |    // (CAST(nn AS HUGEINT) * ${lnm("nn")} - sx)
           |    AS BIGINT) AS u_ppm
           |FROM tot, hx, hy, hxy""".stripMargin
      }) { (s, dir) =>
      val lnm = (e: String) => s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
        s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val c = events(s, dir)
        .groupBy(col("event_type").as("x"),
          dayofweek(col("ts")).cast("long").as("y"))
        .agg(count(lit(1)).as("n"))
      def entSum(df: DataFrame, cnt: String) =
        df.agg(sum(expr(s"CAST($cnt AS DECIMAL(38,0)) " +
          s"* ${lnm(cnt)}")).cast(d38))
      val mx = entSum(c.groupBy(col("x"))
        .agg(sum(col("n")).cast("long").as("c")), "c").toDF("sx")
      val my = entSum(c.groupBy(col("y"))
        .agg(sum(col("n")).cast("long").as("c")), "c").toDF("sy")
      val sxy = entSum(c, "n").toDF("sxy")
      val tot = c.agg(sum(col("n")).cast("long").as("nn"))
      tot.crossJoin(broadcast(mx))
        .crossJoin(broadcast(my))
        .crossJoin(broadcast(sxy))
        .select(col("nn").as("n_total"),
          expr(s"CAST((CAST(nn AS DECIMAL(38,0)) * ${lnm("nn")} - sx)" +
            " div nn AS BIGINT)").as("hx_micro"),
          expr("CAST((sy - sxy) div nn AS BIGINT)")
            .as("hx_given_y_micro"),
          expr(s"CAST((CAST(nn AS DECIMAL(38,0)) * ${lnm("nn")} - sx" +
            s" - (sy - sxy)) * 1000000 div (CAST(nn AS DECIMAL(38,0))" +
            s" * ${lnm("nn")} - sx) AS BIGINT)").as("u_ppm"))
    },

    // Cohen's d between the click and view value distributions — the
    // STANDARDIZED effect size beside the mannwhitney/cliffs-delta
    // rank tests (those say "is there a shift"; d says "how many
    // pooled standard deviations wide is it", the number a power
    // analysis consumes). Sufficient statistics are exact cents
    // integers (n, Σx, Σx² per group, DECIMAL(38,0)/HUGEINT squares);
    // d evaluates once through the shared-text IEEE chain and floors
    // to micro, with Hedges' small-sample correction as the exact
    // rational (1 − 3/(4(n1+n2)−9)) folded in milli. One two-group
    // fold; no window, no join.
    QuerySpec.sql(
      "stats_cohens_d", {
        val d = "((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)" +
          " / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)" +
          " + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))" +
          " / (n1 + n2 - 2)))"
        s"""WITH g AS (
           |  SELECT event_type,
           |    CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           |      AS s,
           |    CAST(SUM(CAST(CAST(round(value * 100) AS BIGINT)
           |      AS HUGEINT) * CAST(round(value * 100) AS BIGINT))
           |      AS HUGEINT) AS q
           |  FROM events WHERE event_type IN ('click', 'view')
           |  GROUP BY 1),
           |p AS (SELECT
           |    MAX(CASE WHEN event_type = 'click' THEN n END) AS n1,
           |    MAX(CASE WHEN event_type = 'click' THEN s END) AS s1,
           |    MAX(CASE WHEN event_type = 'click' THEN q END) AS q1,
           |    MAX(CASE WHEN event_type = 'view' THEN n END) AS n2,
           |    MAX(CASE WHEN event_type = 'view' THEN s END) AS s2,
           |    MAX(CASE WHEN event_type = 'view' THEN q END) AS q2
           |  FROM g)
           |SELECT n1, n2,
           |  CAST(FLOOR($d * 1000000) AS BIGINT) AS d_micro,
           |  CAST(1000 - 3000 // (4 * (n1 + n2) - 9) AS BIGINT)
           |    AS hedges_milli,
           |  CAST(CAST(FLOOR($d * 1000000) AS BIGINT) * (1000 - 3000
           |    // (4 * (n1 + n2) - 9)) // 1000 AS BIGINT) AS g_micro
           |FROM p""".stripMargin
      }) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val dtxt = "((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)" +
        " / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)" +
        " + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))" +
        " / (n1 + n2 - 2)))"
      val g = events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("xc"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("xc")).cast("long").as("s"),
          sum(expr("CAST(xc AS DECIMAL(38,0)) * xc")).cast(d38)
            .as("q"))
      g.agg(
          max(when(col("event_type") === "click", col("n"))).as("n1"),
          max(when(col("event_type") === "click", col("s"))).as("s1"),
          max(when(col("event_type") === "click", col("q"))).as("q1"),
          max(when(col("event_type") === "view", col("n"))).as("n2"),
          max(when(col("event_type") === "view", col("s"))).as("s2"),
          max(when(col("event_type") === "view", col("q"))).as("q2"))
        .select(col("n1"), col("n2"),
          expr(s"CAST(FLOOR($dtxt * 1000000) AS BIGINT)")
            .as("d_micro"),
          expr("CAST(1000 - 3000 div (4 * (n1 + n2) - 9) AS BIGINT)")
            .as("hedges_milli"),
          expr(s"CAST(CAST(FLOOR($dtxt * 1000000) AS BIGINT) " +
            "* (1000 - 3000 div (4 * (n1 + n2) - 9)) div 1000 " +
            "AS BIGINT)").as("g_micro"))
    },

    // Goh–Barabási burstiness parameter per series on the in-user
    // inter-event gaps: B = (σ − μ)/(σ + μ) ∈ (−1, 1) — the
    // temporal-pattern classifier (B → 1 bursty/bot-retry, B ≈ 0
    // Poisson, B < 0 pacemaker-regular). Gap moments are exact micros
    // integers off the SAME user-keyed LAG every session gate pays
    // (n, Σg, Σg² with the square in DECIMAL(38,0)/HUGEINT); σ is one
    // shared-text sqrt and B floors to micro. Complements
    // events_bot_regularity (per-user CV) with the per-SERIES
    // population readout.
    QuerySpec.sql(
      "events_burstiness_gb", {
        val b = "((sqrt((CAST(q AS DOUBLE) - CAST(sg AS DOUBLE) * sg" +
          " / n) / n) - CAST(sg AS DOUBLE) / n)" +
          " / (sqrt((CAST(q AS DOUBLE) - CAST(sg AS DOUBLE) * sg" +
          " / n) / n) + CAST(sg AS DOUBLE) / n))"
        s"""WITH e AS (SELECT user_id, event_id, event_type,
           |    epoch_us(ts) AS us
           |  FROM events),
           |g0 AS (SELECT event_type AS series,
           |    us - LAG(us) OVER (PARTITION BY user_id, event_type
           |      ORDER BY us, event_id) AS g
           |  FROM e),
           |m AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(g) AS BIGINT) AS sg,
           |    CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS q
           |  FROM g0 WHERE g IS NOT NULL AND g > 0 GROUP BY 1)
           |SELECT series, n,
           |  CAST(sg // n AS BIGINT) AS mean_gap_us,
           |  CAST(FLOOR($b * 1000000) AS BIGINT) AS burstiness_micro
           |FROM m WHERE n >= 2
           |ORDER BY series""".stripMargin
      }) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val btxt = "((sqrt((CAST(q AS DOUBLE) - CAST(sg AS DOUBLE) * sg" +
        " / n) / n) - CAST(sg AS DOUBLE) / n)" +
        " / (sqrt((CAST(q AS DOUBLE) - CAST(sg AS DOUBLE) * sg" +
        " / n) / n) + CAST(sg AS DOUBLE) / n))"
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_id"),
          col("event_type").as("series"),
          unix_micros(col("ts")).as("us"))
        .withColumn("g", col("us") -
          lag(col("us"), 1).over(Window
            .partitionBy(col("user_id"), col("series"))
            .orderBy(col("us"), col("event_id"))))
        .filter(col("g").isNotNull && col("g") > 0)
        .groupBy(col("series"))
        .agg(count(lit(1)).as("n"),
          sum(col("g")).cast("long").as("sg"),
          sum(expr("CAST(g AS DECIMAL(38,0)) * g")).cast(d38).as("q"))
        .filter(col("n") >= 2)
        .select(col("series"), col("n"),
          expr("CAST(sg div n AS BIGINT)").as("mean_gap_us"),
          expr(s"CAST(FLOOR($btxt * 1000000) AS BIGINT)")
            .as("burstiness_micro"))
        .orderBy(col("series"))
    },

    // G-test of independence (log-likelihood ratio) on the same
    // type×weekday contingency as stats_theil_u — the entropy-based
    // sibling of stats_chi2_indep (G is additive across partitions
    // and better-behaved at small expecteds; reporting both is the
    // standard practice). G = 2·Σ O·ln(O·N/(R·C)) decomposes into
    // four c·ln c folds through the ONE shared micro-ln —
    // G_micro = 2·(Σ O·lnm(O) + N·lnm(N) − Σ R·lnm(R) − Σ C·lnm(C))
    // — all exact integers in DECIMAL(38,0)/HUGEINT. Same plan as
    // theil_u: one contingency fold + two marginal folds, no window.
    QuerySpec.sql(
      "stats_g_test", {
        def lnm(e: String) = s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
          s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
        s"""WITH c AS (
           |  SELECT event_type AS x,
           |    CAST(dayofweek(ts) AS BIGINT) AS y,
           |    CAST(COUNT(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2),
           |so AS (SELECT CAST(SUM(CAST(n AS HUGEINT) * ${lnm("n")})
           |    AS HUGEINT) AS v, CAST(COUNT(*) AS BIGINT) AS cells
           |  FROM c),
           |sr AS (SELECT CAST(SUM(CAST(t AS HUGEINT) * ${lnm("t")})
           |    AS HUGEINT) AS v, CAST(COUNT(*) AS BIGINT) AS k
           |  FROM (SELECT x, SUM(n) AS t FROM c GROUP BY 1)),
           |sc AS (SELECT CAST(SUM(CAST(t AS HUGEINT) * ${lnm("t")})
           |    AS HUGEINT) AS v, CAST(COUNT(*) AS BIGINT) AS m
           |  FROM (SELECT y, SUM(n) AS t FROM c GROUP BY 1)),
           |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c)
           |SELECT nn AS n_total, so.cells AS n_cells,
           |  CAST((sr.k - 1) * (sc.m - 1) AS BIGINT) AS dof,
           |  CAST(2 * (so.v + CAST(nn AS HUGEINT) * ${lnm("nn")}
           |    - sr.v - sc.v) AS BIGINT) AS g_micro
           |FROM so, sr, sc, tt""".stripMargin
      }) { (s, dir) =>
      val lnm = (e: String) => s"CAST(CAST(ln(CAST($e AS DOUBLE)) " +
        s"AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val c = events(s, dir)
        .groupBy(col("event_type").as("x"),
          dayofweek(col("ts")).cast("long").as("y"))
        .agg(count(lit(1)).as("n"))
      val so = c.agg(
        sum(expr(s"CAST(n AS DECIMAL(38,0)) * ${lnm("n")}")).cast(d38)
          .as("v"),
        count(lit(1)).as("cells")).toDF("v", "cells")
      val sr = c.groupBy(col("x")).agg(sum(col("n")).cast("long")
          .as("t"))
        .agg(sum(expr(s"CAST(t AS DECIMAL(38,0)) * ${lnm("t")}"))
          .cast(d38).as("v"), count(lit(1)).as("k")).toDF("rv", "k")
      val sc2 = c.groupBy(col("y")).agg(sum(col("n")).cast("long")
          .as("t"))
        .agg(sum(expr(s"CAST(t AS DECIMAL(38,0)) * ${lnm("t")}"))
          .cast(d38).as("v"), count(lit(1)).as("m")).toDF("cv", "m")
      val tt = c.agg(sum(col("n")).cast("long").as("nn"))
      tt.crossJoin(broadcast(so)).crossJoin(broadcast(sr))
        .crossJoin(broadcast(sc2))
        .select(col("nn").as("n_total"), col("cells").as("n_cells"),
          expr("CAST((k - 1) * (m - 1) AS BIGINT)").as("dof"),
          expr(s"CAST(2 * (v + CAST(nn AS DECIMAL(38,0)) * " +
            s"${lnm("nn")} - rv - cv) AS BIGINT)").as("g_micro"))
    },

    // Rolling market beta per series (14-day): cov(series, market) /
    // var(market) over the trailing window, where "market" is the
    // all-types daily total — which series amplifies the aggregate
    // flow and which is idiosyncratic. The OLS sufficient statistics
    // fold inside ONE series-keyed 14-row window over exact daily
    // counts, and beta is one milli truncating division (div ≡ //,
    // toward zero — the covariance numerator is SIGNED) of the closed
    // form (nΣxy − ΣxΣy)·1000 // (nΣxx − (Σx)²) — BIGINT-safe while
    // a 14-day count product stays under ~9e18 (10⁸-row days);
    // larger grains route the sums through DECIMAL(38,0) like the
    // kendall machinery.
    // Grubbs' outlier test per event type — the single-outlier
    // screen beside events_mad_outliers (MAD flags many; Grubbs
    // scores THE most extreme point against the normal-theory null).
    // Exact integers throughout: with cents m, n, S = Σm, Q = Σm²,
    // G² = (n−1)·devmax² / (n·(nQ − S²)) where devmax =
    // max|n·m − S| — the ×n-scaled deviation, so no division happens
    // before the single floor-to-micro at the end. The flagged value
    // rides along (min m among devmax achievers — a deterministic
    // tie-break both engines spell identically). The α=5% two-sided
    // VERDICT compares g2_micro against gcrit2_micro from the shared
    // [[grubbsCritCols]] chain — an exact 40-row critical-value
    // literal for n ≤ 42, the micro-ln → Acklam → Cornish–Fisher
    // IEEE chain past it (max rel err 2.9e−7 vs the exact t
    // quantile across n = 43..10⁸) — so reject/accept is a BIGINT
    // compare in both engines, like stats_holm/stats_fdr_bh.
    // Overflow is loud in BOTH engines: the (n−1)·devmax²·10⁶
    // multiply throws under ANSI (Spark 4 default — probed, so no
    // dead is-null guard) as DuckDB's HUGEINT does, and the one
    // SILENT Spark path — decimal `div` wrapping its long quotient —
    // is closed by an explicit raise_error at the documented
    // n > 9·10¹² envelope. Plan: one events fold + one broadcast-join
    // deviation pass, NOT Materialize.stable'd — dev is a row-scale
    // derived column whose two consumers re-derive it from a
    // column-pruned scan + broadcast join (recompute beats
    // materializing rows; the 100 TB posture); the critical-value
    // chain runs on the ≤ k-row aggregate frame; no window.
    QuerySpec.sql(
      "stats_grubbs", {
        // layer the shared critical-value chain as one CTE per
        // column over the ≤ k-row result frame r
        val zc = grubbsCritCols.zipWithIndex.map { case ((c, e), i) =>
          val src = if (i == 0) "r" else s"z$i"
          s"z${i + 1} AS (SELECT *, $e AS $c FROM $src)"
        }.mkString(",\n")
        val zLast = s"z${grubbsCritCols.size}"
        s"""WITH v AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS m
        |  FROM events),
        |g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(m) AS BIGINT) AS s,
        |    CAST(SUM(CAST(m AS HUGEINT) * m) AS HUGEINT) AS q
        |  FROM v GROUP BY 1 HAVING COUNT(*) >= 3),
        |dv AS (
        |  SELECT v.event_type, g.n, g.s, g.q, v.m,
        |    ABS(g.n * CAST(v.m AS HUGEINT) - g.s) AS dev
        |  FROM v JOIN g USING (event_type)),
        |d AS (
        |  SELECT event_type, n, s, q, MAX(dev) AS devmax
        |  FROM dv GROUP BY 1, 2, 3, 4),
        |o AS (
        |  SELECT dv.event_type, CAST(MIN(dv.m) AS BIGINT) AS outlier_c
        |  FROM dv JOIN d USING (event_type)
        |  WHERE dv.dev = d.devmax GROUP BY 1),
        |r AS (
        |  SELECT d.event_type, d.n, o.outlier_c,
        |    CAST(CASE WHEN d.n * d.q - CAST(d.s AS HUGEINT) * d.s > 0
        |      THEN (d.n - 1) * d.devmax * d.devmax * 1000000
        |        // (d.n * (d.n * d.q - CAST(d.s AS HUGEINT) * d.s))
        |      END AS BIGINT) AS g2_micro
        |  FROM d JOIN o USING (event_type)),
        |$zc
        |SELECT event_type, n, outlier_c, g2_micro, gcrit2_micro,
        |  g2_micro > gcrit2_micro AS reject
        |FROM $zLast ORDER BY event_type""".stripMargin
      }) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val v = events(s, dir)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("m"))
      val g = v.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("m")).cast("long").as("s"),
          sum(expr("CAST(m AS DECIMAL(38,0)) * m")).cast(d38).as("q"))
        .filter(col("n") >= 3)
      // not Materialize.stable'd: dev is a row-scale derived column;
      // its two consumers (max fold, argmax filter) re-derive it from
      // a column-pruned scan + broadcast join — cheaper than
      // checkpoint-writing the row-scale deviation table, which is
      // also the 100 TB posture (recompute, never materialize rows)
      val dv = v
        .join(broadcast(g), Seq("event_type"))
        .withColumn("dev",
          expr("ABS(n * CAST(m AS DECIMAL(38,0)) - s)").cast(d38))
      val d = dv.groupBy(col("event_type"), col("n"), col("s"),
          col("q"))
        .agg(max(col("dev")).cast(d38).as("devmax"))
      val o = dv
        .join(broadcast(d.select(col("event_type"), col("devmax"))),
          Seq("event_type"))
        .filter(col("dev") === col("devmax"))
        .groupBy(col("event_type"))
        .agg(min(col("m")).cast("long").as("outlier_c"))
      // Overflow posture, checked empirically under this session's
      // ANSI=true (Spark 4 default): the (n−1)·devmax²·10⁶ DECIMAL
      // multiply THROWS (NUMERIC_VALUE_OUT_OF_RANGE) past the 38-digit
      // envelope — already loud, symmetric with the oracle's HUGEINT
      // error, so a ChrfClip-style is-null guard here would be dead
      // code. The SILENT hole is the quotient: Spark's decimal `div`
      // WRAPS to a bogus long past 2⁶³ (probed: 10³⁸ div 1 returns a
      // wrapped positive) where DuckDB's HUGEINT→BIGINT cast errors.
      // The quotient is mathematically ≤ ((n−1)²/n + 1)·10⁶, so the
      // sign-test-style envelope guard on n below makes that failure
      // loud at the documented bound (n > 9·10¹² rows per group)
      // instead of wrapping.
      val r = d.join(broadcast(o), Seq("event_type"))
        .select(col("event_type"), col("n"), col("outlier_c"),
          expr("""CAST(CASE WHEN n > 9000000000000
            |  THEN raise_error(concat('stats_grubbs: G2*1e6 can ',
            |    'exceed the BIGINT quotient envelope at n > 9e12; ',
            |    'rescale before dividing'))
            |  WHEN n * q - CAST(s AS DECIMAL(38,0)) * s > 0
            |  THEN (n - 1) * devmax * devmax * 1000000
            |    div (n * (n * q - CAST(s AS DECIMAL(38,0)) * s))
            |  END AS BIGINT)""".stripMargin).as("g2_micro"))
      grubbsCritCols.foldLeft(r) { case (df, (c, e)) =>
          df.withColumn(c, expr(e)) }
        .select(col("event_type"), col("n"), col("outlier_c"),
          col("g2_micro"), col("gcrit2_micro"),
          expr("g2_micro > gcrit2_micro").as("reject"))
        .orderBy(col("event_type"))
    },

    // Holm step-down adjusted p-values over the sign-test family —
    // the FWER-controlling sibling of stats_fdr_bh (BH bounds the
    // false-DISCOVERY rate; Holm bounds ANY false positive, the bar
    // a go/no-go family of launch tests actually needs, uniformly
    // more powerful than the flat Bonferroni the BH gate reports).
    // Rides the SAME exact-rational sign-test frame: p = p_num/2ⁿ
    // scaled to a common 2^nmax denominator, ranked ascending;
    // reject ranks 1..r* where r* + 1 is the FIRST rank with
    // 20·(m−rank+1)·p_scaled > 2^nmax (α = 5%, exact integers), and
    // the adjusted p is the running max of min(1, (m−rank+1)·p) in
    // micro. The running max runs as a triangle self-join on the
    // ≤ m-row test table (m = series count, ~10) — keyed-join
    // shaped, no unpartitioned window; ranking via the PrefixSum
    // global cumsum like the BH gate.
    QuerySpec.sql(
      "stats_holm", {
        s"""WITH RECURSIVE $signTestCtes,
           |mm AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
           |    CAST(MAX(n) AS BIGINT) AS nmax
           |  FROM sgn),
           |sc AS (
           |  SELECT s.series, s.n, s.k, s.p_num, s.p_den, mm.m,
           |    mm.nmax,
           |    s.p_num * (1::BIGINT << CAST(mm.nmax - s.n AS INT))
           |      AS p_scaled
           |  FROM sgn s, mm),
           |rk AS (
           |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_scaled,
           |    series) AS BIGINT) AS rnk
           |  FROM sc),
           |tm AS (
           |  SELECT rnk AS j, LEAST(CAST(1000000 AS BIGINT),
           |    CAST((m - rnk + 1) * CAST(p_scaled AS HUGEINT)
           |      * 1000000
           |      // (1::BIGINT << CAST(nmax AS INT)) AS BIGINT))
           |    AS term
           |  FROM rk),
           |ff AS (
           |  SELECT COALESCE(MIN(CASE WHEN
           |      20 * (m - rnk + 1) * CAST(p_scaled AS HUGEINT) >
           |      (1::BIGINT << CAST(nmax AS INT))
           |    THEN rnk END), MAX(m) + 1) AS first_fail
           |  FROM rk)
           |SELECT r.series, r.n, r.k, r.p_num, r.p_den, r.rnk AS rank,
           |  CAST(MAX(t.term) AS BIGINT) AS holm_p_micro,
           |  r.rnk < ff.first_fail AS holm_reject
           |FROM rk r JOIN tm t ON t.j <= r.rnk, ff
           |GROUP BY ALL
           |ORDER BY rank, series""".stripMargin
      }) { (s, dir) =>
      import graft.functions.PrefixSum
      val sgn = Materialize.stable(signTest(s, dir))
      val mm = sgn.agg(count(lit(1)).cast("long").as("m"),
        max(col("n")).cast("long").as("nmax"))
      val sc = sgn.crossJoin(broadcast(mm))
        .withColumn("p_scaled", expr(
          "p_num * shiftleft(CAST(1 AS BIGINT), CAST(nmax - n AS INT))"))
      val rk = Materialize.stable(PrefixSum.globalCumsum(sc,
        Seq(col("p_scaled"), col("series")), lit(1L), "rnk"))
      val tm = rk.select(col("rnk").as("j"),
        least(lit(1000000L), expr(
          "CAST((m - rnk + 1) * CAST(p_scaled AS DECIMAL(38,0))" +
            " * 1000000" +
            " div shiftleft(CAST(1 AS BIGINT), CAST(nmax AS INT))" +
            " AS BIGINT)")).as("term"))
      val ff = rk.agg(coalesce(min(when(expr(
          "20 * (m - rnk + 1) * CAST(p_scaled AS DECIMAL(38,0)) > " +
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(nmax AS INT))" +
            " AS DECIMAL(38,0))"), col("rnk"))),
          max(col("m")) + 1).as("first_fail"))
      rk.join(broadcast(tm), col("j") <= col("rnk"))
        .groupBy(col("series"), col("n"), col("k"), col("p_num"),
          col("p_den"), col("rnk"))
        .agg(max(col("term")).cast("long").as("holm_p_micro"))
        .crossJoin(broadcast(ff))
        .select(col("series"), col("n"), col("k"), col("p_num"),
          col("p_den"), col("rnk").as("rank"), col("holm_p_micro"),
          (col("rnk") < col("first_fail")).as("holm_reject"))
        .orderBy(col("rank"), col("series"))
    },

    // Jackknife variance of the ratio estimator — the resampling
    // companion to stats_bootstrap_means for a NON-linear statistic
    // (a ratio's plug-in variance has no exact closed form; the
    // delete-one jackknife is the classical distribution-free
    // answer). Per return flag over lineitem: R = Σprice/Σqty, the
    // delete-one pseudovalue θ_i = (Sy − y_i)/(Sx − x_i) quantized
    // to an exact MILLI integer per row FIRST (milli, not micro: the
    // variance is a SQUARE, and at small n — where delete-one moves
    // the ratio most — the micro² figure overflowed int64 at
    // sf0.001; milli² peaks ~1.5e13 there and SHRINKS with n) (the established
    // discipline — integer sums are order-independent where float
    // accumulation is not), then Var_jk = (n−1)/n · Σ(θ − θ̄)² as
    // one exact rational over Σθ, Σθ²: ((nΣθ² − (Σθ)²) // n ·
    // (n−1)) // n — divided EARLY so the 38-digit envelope holds at
    // any SF. Plan: one lineitem fold to 3-row group totals,
    // broadcast back over one row-scale pass, one fold; no window,
    // no per-row shuffle.
    QuerySpec.sql(
      "stats_jackknife_ratio",
      """WITH r AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
        |    CAST(l_quantity AS BIGINT) AS x
        |  FROM lineitem),
        |g AS (
        |  SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x) AS BIGINT) AS sx
        |  FROM r GROUP BY 1 HAVING COUNT(*) >= 2),
        |t AS (
        |  SELECT r.flag,
        |    CAST((g.sy - r.y) * CAST(1000 AS HUGEINT)
        |      // (g.sx - r.x) AS BIGINT) AS th
        |  FROM r JOIN g USING (flag) WHERE g.sx - r.x > 0),
        |a AS (
        |  SELECT flag, CAST(COUNT(*) AS BIGINT) AS nt,
        |    CAST(SUM(CAST(th AS HUGEINT)) AS HUGEINT) AS st,
        |    CAST(SUM(CAST(th AS HUGEINT) * th) AS HUGEINT) AS st2
        |  FROM t GROUP BY 1)
        |SELECT g.flag, g.n,
        |  CAST(CAST(g.sy AS HUGEINT) * 1000 // g.sx AS BIGINT)
        |    AS ratio_milli,
        |  CAST((((a.nt * a.st2 - a.st * a.st) // a.nt) * (a.nt - 1))
        |    // a.nt AS BIGINT) AS jk_var_milli2
        |FROM g JOIN a USING (flag)
        |ORDER BY g.flag""".stripMargin) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      // NOT Materialize.stable'd: r is row-scale, and its two
      // consumers (the 3-row totals fold and the pseudovalue pass)
      // each re-read a column-pruned parquet scan — two cheap scans
      // beat checkpoint-writing the whole fact table
      val r = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"),
          col("l_quantity").cast("long").as("x"))
      val g = r.groupBy(col("flag"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x")).cast("long").as("sx"))
        .filter(col("n") >= 2)
      val a = r.join(broadcast(g), Seq("flag"))
        .filter(col("sx") - col("x") > 0)
        .select(col("flag"), expr(
          "CAST((sy - y) * CAST(1000 AS DECIMAL(38,0))" +
            " div (sx - x) AS BIGINT)").as("th"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).cast("long").as("nt"),
          sum(expr("CAST(th AS DECIMAL(38,0))")).cast(d38).as("st"),
          sum(expr("CAST(th AS DECIMAL(38,0)) * th")).cast(d38)
            .as("st2"))
      g.join(broadcast(a), Seq("flag"))
        .select(col("flag"), col("n"),
          expr("CAST(CAST(sy AS DECIMAL(38,0)) * 1000 div sx" +
            " AS BIGINT)").as("ratio_milli"),
          // the inner quotient re-enters DECIMAL(38,0) before the
          // (nt − 1) product: Spark's div yields LONG, and the bare
          // long×long overflows where DuckDB's HUGEINT carries on
          expr("CAST((CAST((nt * st2 - st * st) div nt" +
            " AS DECIMAL(38,0)) * (nt - 1))" +
            " div nt AS BIGINT)").as("jk_var_milli2"))
        .orderBy(col("flag"))
    },

    QuerySpec.sql(
      "ts_rolling_beta",
      """WITH cnts AS (
        |  SELECT event_type AS series,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |mkt AS (SELECT day, CAST(SUM(y) AS BIGINT) AS x
        |  FROM cnts GROUP BY 1),
        |j AS (SELECT c.series, c.day, c.y, m.x
        |  FROM cnts c JOIN mkt m ON m.day = c.day),
        |w AS (SELECT series, day,
        |    CAST(COUNT(*) OVER win AS BIGINT) AS n,
        |    CAST(SUM(x) OVER win AS BIGINT) AS sx,
        |    CAST(SUM(y) OVER win AS BIGINT) AS sy,
        |    CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) OVER win AS BIGINT) AS sxx
        |  FROM j WINDOW win AS (PARTITION BY series ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT series, day,
        |  CAST(CASE WHEN n * sxx - sx * sx > 0
        |    THEN (n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx)
        |    END AS BIGINT) AS beta_milli
        |FROM w WHERE n = 14
        |ORDER BY series, day""".stripMargin) { (s, dir) =>
      val cnts = events(s, dir)
        .groupBy(col("event_type").as("series"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("y"))
      val mkt = cnts.groupBy(col("day"))
        .agg(sum(col("y")).cast("long").as("x"))
      val w14 = Window.partitionBy(col("series")).orderBy(col("day"))
        .rowsBetween(-13, 0)
      cnts.join(mkt, Seq("day"))
        .withColumn("n", count(lit(1)).over(w14).cast("long"))
        .withColumn("sx", sum(col("x")).over(w14).cast("long"))
        .withColumn("sy", sum(col("y")).over(w14).cast("long"))
        .withColumn("sxy",
          sum(col("x") * col("y")).over(w14).cast("long"))
        .withColumn("sxx",
          sum(col("x") * col("x")).over(w14).cast("long"))
        .filter(col("n") === 14)
        .select(col("series"), col("day"),
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
            expr("(n * sxy - sx * sy) * 1000 " +
              "div (n * sxx - sx * sx)"))
            .cast("long").as("beta_milli"))
        .orderBy(col("series"), col("day"))
    },

    // Heavy-user concentration: what share of ALL events does the
    // most-active decile of USERS generate? The abuse/bot-screening
    // and capacity-planning readout (a healthy product reads well
    // under 10⁶ ppm; a scraper farm pins it). Exact: per-user counts
    // collapse to the count-of-counts histogram, the top-decile cut
    // runs on the PrefixSum global cumsum of that BOUNDED histogram
    // (users and events cumulated in ONE pass), and the boundary
    // class contributes exactly the users needed — no row-scale sort,
    // no approximation. need = ceil(U/10); share one ppm division.
    QuerySpec.sql(
      "events_user_concentration",
      """WITH uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |h AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS u,
        |    CAST(c * COUNT(*) AS BIGINT) AS ev
        |  FROM uc GROUP BY 1),
        |r AS (SELECT c, u, ev,
        |    CAST(SUM(u) OVER w AS BIGINT) AS cumu,
        |    CAST(SUM(ev) OVER w AS BIGINT) AS cumev
        |  FROM h WINDOW w AS (ORDER BY c DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(SUM(u) AS BIGINT) AS uu,
        |    CAST(SUM(ev) AS BIGINT) AS ee,
        |    CAST((SUM(u) + 9) // 10 AS BIGINT) AS need
        |  FROM h)
        |SELECT t.uu AS n_users, t.ee AS n_events,
        |  t.need AS top_users,
        |  CAST(SUM(CASE WHEN r.cumu <= t.need THEN r.ev
        |    WHEN r.cumu - r.u < t.need
        |      THEN (t.need - (r.cumu - r.u)) * r.c
        |    ELSE 0 END) AS BIGINT) AS top_events,
        |  CAST(SUM(CASE WHEN r.cumu <= t.need THEN r.ev
        |    WHEN r.cumu - r.u < t.need
        |      THEN (t.need - (r.cumu - r.u)) * r.c
        |    ELSE 0 END) * 1000000 // t.ee AS BIGINT) AS share_ppm
        |FROM r CROSS JOIN t
        |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val h = events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .groupBy(col("c"))
        .agg(count(lit(1)).as("u"),
          (col("c") * count(lit(1))).cast("long").as("ev"))
      val r = graft.functions.PrefixSum.globalCumsumMulti(h,
        Seq(-col("c")), Seq(col("u") -> "cumu", col("ev") -> "cumev"))
      val t = h.agg(sum(col("u")).cast("long").as("uu"),
        sum(col("ev")).cast("long").as("ee"),
        expr("CAST((SUM(u) + 9) div 10 AS BIGINT)").as("need"))
      val top = "CASE WHEN cumu <= need THEN ev " +
        "WHEN cumu - u < need THEN (need - (cumu - u)) * c ELSE 0 END"
      r.crossJoin(broadcast(t))
        .groupBy(col("uu"), col("ee"), col("need"))
        .agg(sum(expr(top)).cast("long").as("top_events"),
          expr(s"CAST(SUM($top) * 1000000 div ee AS BIGINT)")
            .as("share_ppm"))
        .select(col("uu").as("n_users"), col("ee").as("n_events"),
          col("need").as("top_users"), col("top_events"),
          col("share_ppm"))
    })

  /** Daily OHLC candle in exact cents, shared by the five
    * technical-analysis gates (ts_rsi/atr/obv/stochastic/chaikin_mf):
    * the a1/a2 candle rollup re-expressed on the portable
    * `round(value·100)` cents quantization so every downstream
    * indicator stays in BIGINT. open/close pick by the unique
    * event_id (min_by/max_by — associative, no sort); volume sums the
    * PER-ROW cents quantization (never `round(sum)·100`), so both
    * engines fold identical integers. One row per (series, day):
    * bounded metadata at any scale.
    */
  private[graft] def dailyOhlc(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type").as("series"),
        to_date(col("ts")).as("day"))
      .agg(
        expr("CAST(round(min_by(value, event_id) * 100) AS BIGINT)")
          .as("open_c"),
        expr("CAST(round(max_by(value, event_id) * 100) AS BIGINT)")
          .as("close_c"),
        expr("CAST(round(max(value) * 100) AS BIGINT)").as("high_c"),
        expr("CAST(round(min(value) * 100) AS BIGINT)").as("low_c"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).cast("long")
          .as("vol_c"))

  /** DuckDB mirror of [[dailyOhlc]]; a CTE named `daily` (expects to
    * open a WITH list).
    */
  private val dailyOhlcSql =
    """daily AS (
      |  SELECT event_type AS series,
      |    CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(round(min_by(value, event_id) * 100) AS BIGINT)
      |      AS open_c,
      |    CAST(round(max_by(value, event_id) * 100) AS BIGINT)
      |      AS close_c,
      |    CAST(round(max(value) * 100) AS BIGINT) AS high_c,
      |    CAST(round(min(value) * 100) AS BIGINT) AS low_c,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS vol_c
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Per-day decay weights, age 0–29: round(0.9^age·10⁶) and
    * round(0.8^age·10⁶) — fixed literals shared verbatim with the
    * oracle so the decayed sums are float-free in both engines.
    */
  private[graft] val decayWeights: Seq[(Int, Long, Long)] = {
    val w9 = Seq(1000000L, 900000L, 810000L, 729000L, 656100L,
      590490L, 531441L, 478297L, 430467L, 387420L, 348678L, 313811L,
      282430L, 254187L, 228768L, 205891L, 185302L, 166772L, 150095L,
      135085L, 121577L, 109419L, 98477L, 88629L, 79766L, 71790L,
      64611L, 58150L, 52335L, 47101L)
    val w8 = Seq(1000000L, 800000L, 640000L, 512000L, 409600L,
      327680L, 262144L, 209715L, 167772L, 134218L, 107374L, 85899L,
      68719L, 54976L, 43980L, 35184L, 28147L, 22518L, 18014L, 14412L,
      11529L, 9223L, 7379L, 5903L, 4722L, 3778L, 3022L, 2418L, 1934L,
      1547L)
    (0 until 30).map(i => (i, w9(i), w8(i)))
  }

  private val decayWeightsSql: String =
    decayWeights.map { case (a, x, y) => s"($a, $x, $y)" }
      .mkString(", ")
}
