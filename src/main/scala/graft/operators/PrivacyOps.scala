package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Md5Prefix
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy / governance operators — the checks a curation pipeline runs
  * before a dataset leaves the boundary: k-anonymity auditing,
  * l-diversity, the generalization/suppression ladder that ENFORCES
  * k-anonymity over a location hierarchy, and differentially-private
  * noisy counts.
  *
  * Scale notes (100 TB): every gate is one or two keyed aggregations —
  * the quasi-identifier class is the shuffle key, so class statistics
  * partition perfectly; the generalization ladder's second level
  * re-aggregates the (already class-grain) residue, and the hierarchy
  * lookup (nation → region) is a broadcast join. The DP noise draw is
  * the engine-portable md5 hash ([[Md5Prefix]]): deterministic per
  * group, no driver-side RNG state, and the identical inverse-CDF
  * expression TEXT runs in both engines so the float math agrees
  * bit-for-bit (same discipline as TimeSeriesOps.LinReg).
  */
object PrivacyOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Balance bucket: floor(acctbal / 1000) over the exact decimal —
    * the coarsened numeric quasi-identifier. */
  private val balBucketSql = "CAST(FLOOR(c_acctbal / 1000) AS BIGINT)"

  /** Laplace(b = 1/eps, eps = 0.5) noise via the inverse CDF over a
    * uniform u ∈ [0,1): -b * sgn(u - 1/2) * ln(1 - 2|u - 1/2|).
    * Shared expression TEXT, compiled by both engines over (cnt, u).
    */
  private val dpNoisy =
    "CAST(cnt AS DOUBLE) - CAST(2 AS DOUBLE)" +
      " * (CASE WHEN u >= CAST(0.5 AS DOUBLE) THEN CAST(1 AS DOUBLE)" +
      " ELSE CAST(-1 AS DOUBLE) END)" +
      // greatest() floors the ln argument at machine epsilon: u = 0
      // (a zero md5 prefix) would otherwise hit ln(0), where the
      // engines disagree (NULL vs -inf)
      " * ln(greatest(CAST(1 AS DOUBLE)" +
      " - CAST(2 AS DOUBLE) * abs(u - CAST(0.5 AS DOUBLE))," +
      " CAST(2.220446049250313e-16 AS DOUBLE)))"

  def specs: Seq[QuerySpec] = Seq(

    // k-anonymity audit: with QI = (nation, segment, balance bucket),
    // how close is the customer table to 5-anonymous? Per nation:
    // classes, the smallest class, and the rows/classes whose QI class
    // has fewer than k=5 members (re-identifiable under linkage).
    // One shuffle on the QI, one map-side-combinable rollup to nation.
    QuerySpec.sql(
      "privacy_k_anon",
      s"""WITH q AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    $balBucketSql AS bal_bucket,
         |    COUNT(*) AS sz
         |  FROM customer GROUP BY 1, 2, 3)
         |SELECT c_nationkey AS nation_key,
         |  CAST(COUNT(*) AS BIGINT) AS n_classes,
         |  CAST(MIN(sz) AS BIGINT) AS min_class_size,
         |  CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0)
         |    AS BIGINT) AS rows_at_risk,
         |  CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN 1 END), 0)
         |    AS BIGINT) AS classes_at_risk
         |FROM q GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("c_nationkey").as("nation_key"))
        .agg(count(lit(1)).as("n_classes"),
          min(col("sz")).as("min_class_size"),
          coalesce(sum(when(col("sz") < 5, col("sz"))), lit(0L))
            .as("rows_at_risk"),
          coalesce(sum(when(col("sz") < 5, 1L)), lit(0L))
            .as("classes_at_risk"))
        .orderBy(col("nation_key"))
    },

    // l-diversity: a k-anonymous class is still unsafe if everyone in
    // it shares the sensitive value (homogeneity attack). With QI =
    // (nation, balance bucket) and segment as the sensitive attribute:
    // per nation, the least-diverse class and the rows in classes
    // below l = 2 distinct sensitive values.
    QuerySpec.sql(
      "privacy_l_diversity",
      s"""WITH q AS (
         |  SELECT c_nationkey,
         |    $balBucketSql AS bal_bucket,
         |    COUNT(*) AS sz,
         |    COUNT(DISTINCT c_mktsegment) AS ldiv
         |  FROM customer GROUP BY 1, 2)
         |SELECT c_nationkey AS nation_key,
         |  CAST(COUNT(*) AS BIGINT) AS n_classes,
         |  CAST(MIN(ldiv) AS BIGINT) AS min_l,
         |  CAST(COALESCE(SUM(CASE WHEN ldiv < 2 THEN sz END), 0)
         |    AS BIGINT) AS rows_below_l2
         |FROM q GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
        .agg(count(lit(1)).as("sz"),
          countDistinct(col("c_mktsegment")).as("ldiv"))
        .groupBy(col("c_nationkey").as("nation_key"))
        .agg(count(lit(1)).as("n_classes"),
          min(col("ldiv")).as("min_l"),
          coalesce(sum(when(col("ldiv") < 2, col("sz"))), lit(0L))
            .as("rows_below_l2"))
        .orderBy(col("nation_key"))
    },

    // Generalization ladder — ENFORCING 5-anonymity, not just auditing
    // it: rows whose (nation, segment) class has ≥ 5 members publish
    // at nation grain; smaller classes generalize up the hierarchy to
    // (region, segment); a region-level class still under 5 is
    // suppressed outright. Per region: rows at each disposition.
    // Class grain first (one shuffle), then the residue re-aggregates
    // at region grain — the second pass runs on ~|classes| rows, not
    // ~|customers|; the nation→region lookup broadcasts.
    QuerySpec.sql(
      "privacy_suppression",
      """WITH q AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz
        |  FROM customer GROUP BY 1, 2),
        |j AS (
        |  SELECT n_regionkey, c_mktsegment, sz
        |  FROM q JOIN nation ON n_nationkey = c_nationkey),
        |lvl AS (
        |  SELECT n_regionkey, c_mktsegment,
        |    COALESCE(SUM(CASE WHEN sz >= 5 THEN sz END), 0) AS pub,
        |    COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0) AS gen
        |  FROM j GROUP BY 1, 2)
        |SELECT n_regionkey AS region_key,
        |  CAST(SUM(pub) AS BIGINT) AS rows_nation_level,
        |  CAST(COALESCE(SUM(CASE WHEN gen >= 5 THEN gen END), 0)
        |    AS BIGINT) AS rows_region_level,
        |  CAST(COALESCE(SUM(CASE WHEN gen > 0 AND gen < 5 THEN gen END),
        |    0) AS BIGINT) AS rows_suppressed
        |FROM lvl GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val q = t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("sz"))
      val lvl = q
        .join(broadcast(t(s, dir, "nation")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_regionkey"), col("c_mktsegment"))
        .agg(
          coalesce(sum(when(col("sz") >= 5, col("sz"))), lit(0L))
            .as("pub"),
          coalesce(sum(when(col("sz") < 5, col("sz"))), lit(0L))
            .as("gen"))
      lvl.groupBy(col("n_regionkey").as("region_key"))
        .agg(sum(col("pub")).as("rows_nation_level"),
          coalesce(sum(when(col("gen") >= 5, col("gen"))), lit(0L))
            .as("rows_region_level"),
          coalesce(
            sum(when(col("gen") > 0 && col("gen") < 5, col("gen"))),
            lit(0L)).as("rows_suppressed"))
        .orderBy(col("region_key"))
    },

    // t-closeness: a diverse class can STILL leak if its sensitive-
    // value distribution diverges from the table's (skewness attack —
    // "everyone in this class is in the top balance bracket"). With
    // QI = (nation, segment) and the ordered balance bucket as the
    // sensitive attribute, per-class t = ordered-EMD(class dist,
    // global dist) = Σᵢ|cum_pᵢ − cum_qᵢ|/(m−1). Computed entirely in
    // the exact cross-product form cum(cc·N − gc·nc): the class×bucket
    // grid is value-domain-sized (classes × ~12 buckets), the window
    // partitions by class, and only the final ppm division leaves
    // integer space (DECIMAL(38,0), the supplier_hhi discipline).
    QuerySpec.sql(
      "privacy_t_closeness",
      s"""WITH r AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    $balBucketSql AS b
         |  FROM customer),
         |g AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS gc
         |  FROM r GROUP BY 1),
         |t AS (SELECT CAST(SUM(gc) AS BIGINT) AS nn,
         |    CAST(COUNT(*) AS BIGINT) AS m FROM g),
         |c AS (SELECT c_nationkey, c_mktsegment, b,
         |    CAST(COUNT(*) AS BIGINT) AS cc
         |  FROM r GROUP BY 1, 2, 3),
         |cl AS (SELECT c_nationkey, c_mktsegment,
         |    CAST(SUM(cc) AS BIGINT) AS nc
         |  FROM c GROUP BY 1, 2),
         |grid AS (
         |  SELECT cl.c_nationkey, cl.c_mktsegment, cl.nc, g.b, g.gc,
         |    COALESCE(c.cc, 0) AS cc
         |  FROM cl CROSS JOIN g
         |  LEFT JOIN c ON c.c_nationkey = cl.c_nationkey
         |    AND c.c_mktsegment = cl.c_mktsegment AND c.b = g.b),
         |cum AS (
         |  SELECT c_nationkey, c_mktsegment, nc,
         |    SUM(cc * nn - gc * nc) OVER (
         |      PARTITION BY c_nationkey, c_mktsegment ORDER BY b) AS d
         |  FROM grid CROSS JOIN t),
         |tc AS (
         |  SELECT c_nationkey, c_mktsegment, nc,
         |    CAST(CAST(SUM(ABS(d)) AS HUGEINT) * 1000000
         |      // (CAST(m - 1 AS HUGEINT) * nc * nn) AS BIGINT)
         |      AS t_ppm
         |  FROM cum CROSS JOIN t
         |  GROUP BY 1, 2, 3, m, nn)
         |SELECT c_nationkey AS nation_key,
         |  CAST(COUNT(*) AS BIGINT) AS n_classes,
         |  CAST(MAX(t_ppm) AS BIGINT) AS max_t_ppm,
         |  CAST(COALESCE(SUM(CASE WHEN t_ppm > 200000 THEN nc END), 0)
         |    AS BIGINT) AS rows_above_t
         |FROM tc GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val r = t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("b"))
      val g = r.groupBy(col("b")).agg(count(lit(1)).as("gc"))
      val tot = g.agg(sum(col("gc")).cast("long").as("nn"),
        count(lit(1)).as("m"))
      val c = r.groupBy(col("c_nationkey"), col("c_mktsegment"), col("b"))
        .agg(count(lit(1)).as("cc"))
      val cl = c.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(sum(col("cc")).cast("long").as("nc"))
      val grid = cl.crossJoin(broadcast(g))
        .join(c, Seq("c_nationkey", "c_mktsegment", "b"), "left")
        .withColumn("cc", coalesce(col("cc"), lit(0L)))
        .crossJoin(broadcast(tot))
      val w = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
        .orderBy(col("b"))
      grid
        .withColumn("d",
          sum(col("cc") * col("nn") - col("gc") * col("nc")).over(w))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("nc"),
          col("m"), col("nn"))
        .agg(sum(abs(col("d"))).as("sad"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("nc"),
          expr("CAST(CAST(sad AS DECIMAL(38,0)) * 1000000" +
            " div (CAST(m - 1 AS DECIMAL(38,0)) * nc * nn) AS BIGINT)")
            .as("t_ppm"))
        .groupBy(col("c_nationkey").as("nation_key"))
        .agg(count(lit(1)).as("n_classes"),
          max(col("t_ppm")).as("max_t_ppm"),
          coalesce(sum(when(col("t_ppm") > 200000, col("nc"))), lit(0L))
            .as("rows_above_t"))
        .orderBy(col("nation_key"))
    },

    // Differentially-private CLIPPED SUMS — the other half of a DP-SQL
    // engine (counts bound sensitivity for free; a sum is unbounded
    // until each row is clipped). Per (nation, segment): balances
    // clipped to [0, 5000] (sensitivity Δ = 5000), summed EXACTLY via
    // the decimal-sum discipline, plus Laplace(b = Δ/ε = 10000) noise
    // from the same portable md5 inverse-CDF draw as privacy_dp_counts
    // — deterministic per group, one shared float-expression text,
    // 6-decimal rounded so the hash compare is exact.
    QuerySpec.sql(
      "privacy_dp_sum", {
        val noisy =
          "s - CAST(10000 AS DOUBLE)" +
            " * (CASE WHEN u >= CAST(0.5 AS DOUBLE) THEN CAST(1 AS DOUBLE)" +
            " ELSE CAST(-1 AS DOUBLE) END)" +
            " * ln(greatest(CAST(1 AS DOUBLE)" +
            " - CAST(2 AS DOUBLE) * abs(u - CAST(0.5 AS DOUBLE))," +
            " CAST(2.220446049250313e-16 AS DOUBLE)))"
        s"""WITH g AS (
           |  SELECT c_nationkey, c_mktsegment,
           |    ${graft.functions.Cols.dsumSql(
               "LEAST(GREATEST(c_acctbal, 0), 5000)")} AS s,
           |    CAST(CAST(('0x' || substr(md5(
           |        CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment
           |        || ':sum'),
           |        1, 13)) AS BIGINT) AS DOUBLE)
           |      / CAST(4503599627370496 AS DOUBLE) AS u
           |  FROM customer GROUP BY 1, 2)
           |SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
           |  CAST(CAST(s AS DECIMAL(18,6)) AS DOUBLE) AS clipped_sum,
           |  CAST(CAST($noisy AS DECIMAL(18,6)) AS DOUBLE)
           |    AS noisy_sum
           |FROM g
           |ORDER BY 1, 2""".stripMargin
      }) { (s, dir) =>
      val noisy =
        "s - CAST(10000 AS DOUBLE)" +
          " * (CASE WHEN u >= CAST(0.5 AS DOUBLE) THEN CAST(1 AS DOUBLE)" +
          " ELSE CAST(-1 AS DOUBLE) END)" +
          " * ln(greatest(CAST(1 AS DOUBLE)" +
          " - CAST(2 AS DOUBLE) * abs(u - CAST(0.5 AS DOUBLE))," +
          " CAST(2.220446049250313e-16 AS DOUBLE)))"
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(graft.functions.Cols.dsum(
          expr("LEAST(GREATEST(c_acctbal, 0), 5000)")).as("s"))
        .withColumn("u",
          Md5Prefix.md5_prefix_long(
            concat(col("c_nationkey").cast("string"), lit(":"),
              col("c_mktsegment"), lit(":sum")), 13).cast("double") /
            lit(4503599627370496L).cast("double"))
        .select(col("c_nationkey").as("nation_key"),
          col("c_mktsegment").as("segment"),
          col("s").cast("decimal(18,6)").cast("double")
            .as("clipped_sum"),
          expr(noisy).cast("decimal(18,6)").cast("double")
            .as("noisy_sum"))
        .orderBy(col("nation_key"), col("segment"))
    },

    // Differentially-private noisy counts (Laplace mechanism, eps =
    // 0.5): per (nation, segment), the true count plus inverse-CDF
    // Laplace noise drawn from the portable md5 hash of the group key
    // — deterministic, coordination-free (each group's draw is a pure
    // function of its key), and the identical expression text runs in
    // both engines. Noise is rounded to 6 decimals (decimal cast) so
    // the hash compare is exact.
    QuerySpec.sql(
      "privacy_dp_counts",
      s"""WITH g AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(CAST(('0x' || substr(md5(
         |        CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment),
         |        1, 13)) AS BIGINT) AS DOUBLE)
         |      / CAST(4503599627370496 AS DOUBLE) AS u
         |  FROM customer GROUP BY 1, 2)
         |SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
         |  cnt,
         |  CAST(CAST($dpNoisy AS DECIMAL(18,6)) AS DOUBLE)
         |    AS noisy_cnt
         |FROM g
         |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("u",
          Md5Prefix.md5_prefix_long(
            concat(col("c_nationkey").cast("string"), lit(":"),
              col("c_mktsegment")), 13).cast("double") /
            lit(4503599627370496L).cast("double"))
        .select(col("c_nationkey").as("nation_key"),
          col("c_mktsegment").as("segment"), col("cnt"),
          expr(dpNoisy).cast("decimal(18,6)").cast("double")
            .as("noisy_cnt"))
        .orderBy(col("nation_key"), col("segment"))
    },

    // Generalization-lattice sweep — the anonymization DECISION the
    // k-anon/suppression gates assume already made: walk five
    // generalization levels of the QI (full → coarser balance →
    // balance dropped → nation→region → region only) and report, per
    // level, the k actually achieved, the residual at-risk mass, and
    // the utility price (discernibility Σ size² — the standard
    // information-loss metric, an exact BIGINT). Every level
    // re-aggregates the ONE finest-grain class table (nested-floor
    // identity: the /2000 bucket is derivable from the /1000 bucket,
    // offset +1000 keeps the halving on nonnegative integers where
    // both engines' integer division floors identically) — the
    // customer facts are scanned exactly once at any scale.
    QuerySpec.sql(
      "privacy_generalization_sweep",
      s"""WITH base AS (
         |  SELECT c.c_nationkey AS nk, n.n_regionkey AS rk,
         |    c.c_mktsegment AS seg, $balBucketSql AS b1,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
         |  GROUP BY 1, 2, 3, 4),
         |c0 AS (SELECT nk, seg, b1, SUM(cnt) AS sz
         |  FROM base GROUP BY 1, 2, 3),
         |c1 AS (SELECT nk, seg, (b1 + 1000) // 2 AS b2, SUM(cnt) AS sz
         |  FROM base GROUP BY 1, 2, 3),
         |c2 AS (SELECT nk, seg, SUM(cnt) AS sz FROM base GROUP BY 1, 2),
         |c3 AS (SELECT rk, seg, SUM(cnt) AS sz FROM base GROUP BY 1, 2),
         |c4 AS (SELECT rk, SUM(cnt) AS sz FROM base GROUP BY 1),
         |u AS (
         |  SELECT 0 AS level, sz FROM c0
         |  UNION ALL SELECT 1, sz FROM c1
         |  UNION ALL SELECT 2, sz FROM c2
         |  UNION ALL SELECT 3, sz FROM c3
         |  UNION ALL SELECT 4, sz FROM c4)
         |SELECT CAST(level AS INT) AS level,
         |  CAST(COUNT(*) AS BIGINT) AS n_classes,
         |  CAST(MIN(sz) AS BIGINT) AS min_class_size,
         |  CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0)
         |    AS BIGINT) AS rows_at_risk,
         |  CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN 1 END), 0)
         |    AS BIGINT) AS classes_at_risk,
         |  CAST(SUM(sz * sz) AS BIGINT) AS discernibility
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val base = graft.functions.Materialize.stable(
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("c_nationkey").as("nk"),
            col("n_regionkey").as("rk"),
            col("c_mktsegment").as("seg"),
            floor(col("c_acctbal") / 1000).cast("long").as("b1"))
          .agg(count(lit(1)).as("cnt")))
      def classes(level: Int, keys: Seq[org.apache.spark.sql.Column]) =
        base.groupBy(keys: _*).agg(sum(col("cnt")).as("sz"))
          .select(lit(level).as("level"), col("sz"))
      val u = classes(0, Seq(col("nk"), col("seg"), col("b1")))
        .union(classes(1, Seq(col("nk"), col("seg"),
          expr("(b1 + 1000) div 2"))))
        .union(classes(2, Seq(col("nk"), col("seg"))))
        .union(classes(3, Seq(col("rk"), col("seg"))))
        .union(classes(4, Seq(col("rk"))))
      u.groupBy(col("level"))
        .agg(count(lit(1)).as("n_classes"),
          min(col("sz")).as("min_class_size"),
          coalesce(sum(when(col("sz") < 5, col("sz"))), lit(0L))
            .as("rows_at_risk"),
          coalesce(sum(when(col("sz") < 5, 1L)), lit(0L))
            .as("classes_at_risk"),
          sum(col("sz") * col("sz")).cast("long").as("discernibility"))
        .orderBy(col("level"))
    },

    // Re-identification risk calculus per nation — the disclosure-risk
    // numbers a release decision actually reads, over the SAME
    // (nation, segment, balance-bucket) quasi-identifier as
    // privacy_k_anon: PROSECUTOR risk (an adversary targeting a known
    // individual succeeds with 1/k of their class — report the worst,
    // 10⁶ // min k) and JOURNALIST/expected risk (a random record's
    // Σ sz·(1/sz)/n = n_classes·10⁶ // n_rows), plus the
    // population-unique count. All exact ppm off the one class-size
    // fold every privacy gate shares.
    QuerySpec.sql(
      "privacy_reid_risk",
      s"""WITH q AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    $balBucketSql AS bal_bucket,
         |    COUNT(*) AS sz
         |  FROM customer GROUP BY 1, 2, 3)
         |SELECT c_nationkey AS nation_key,
         |  CAST(SUM(sz) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_classes,
         |  CAST(COALESCE(SUM(CASE WHEN sz = 1 THEN 1 END), 0)
         |    AS BIGINT) AS n_unique_rows,
         |  CAST(1000000 // MIN(sz) AS BIGINT)
         |    AS prosecutor_risk_ppm,
         |  CAST(COUNT(*) * 1000000 // SUM(sz) AS BIGINT)
         |    AS journalist_risk_ppm
         |FROM q GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("c_nationkey").as("nation_key"))
        .agg(sum(col("sz")).cast("long").as("n_rows"),
          count(lit(1)).as("n_classes"),
          coalesce(sum(when(col("sz") === 1, 1L)), lit(0L))
            .cast("long").as("n_unique_rows"),
          expr("CAST(1000000 div MIN(sz) AS BIGINT)")
            .as("prosecutor_risk_ppm"),
          expr("CAST(COUNT(*) * 1000000 div SUM(sz) AS BIGINT)")
            .as("journalist_risk_ppm"))
        .orderBy(col("nation_key"))
    },

    // Differentially-private median (exponential mechanism, ε = 1) —
    // the DP release for a QUANTILE, where Laplace noise on the value
    // itself would be unbounded-sensitivity nonsense: per event type,
    // every observed cents value is a candidate scored by its
    // twice-rank distance from the median mass (utility −|2·cum_below
    // + c − n|, an exact integer; sensitivity 2 in this ×2 scale, so
    // the exponential weight is ε·u/4), and the draw is the
    // Gumbel-max trick — argmax of score + g where g = −ln(−ln(u01))
    // over the SAME engine-portable md5 uniform as privacy_dp_counts,
    // keyed by (type, value): deterministic, coordination-free, and
    // the identical float expression text runs in both engines, so
    // even the sampled winner is bit-reproducible.
    //
    // IMPORTANT — this gate is a DETERMINISTIC SIMULATION of the
    // exponential mechanism, not a privacy-preserving release: the
    // Gumbel draw is seeded from md5(type, value), i.e. DATA-DERIVED
    // and adversary-predictable, which voids any actual DP guarantee.
    // The determinism is deliberate here — it is what lets the
    // sampled winner be cross-engine hash-compared (the gate verifies
    // the mechanism's SHAPE: scoring, sensitivity scaling, argmax,
    // utility accounting). A deployment substitutes fresh
    // cryptographic randomness for `u` (one column swap); nothing
    // else in the plan changes. Candidates are the
    // observed distinct values (the standard finite-domain
    // simplification — a fixed public grid drops in without plan
    // changes). The exact true median rides along, so the mechanism's
    // utility (|error| in cents) is itself oracle-checked. Plan: one
    // hash aggregate to the value histogram, a KEYED cumsum window,
    // two k-row folds.
    QuerySpec.sql(
      "privacy_dp_quantile", {
        val score = "CAST(-ABS(2 * cumb + c - n) AS DOUBLE) / 4" +
          " - ln(-ln(greatest(u," +
          " CAST(2.220446049250313e-16 AS DOUBLE))))"
        s"""WITH h AS (
           |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
           |    CAST(COUNT(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |r AS (SELECT event_type, v, c,
           |    COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS cumb
           |  FROM h),
           |nn AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
           |  FROM h GROUP BY 1),
           |sc AS (SELECT r.event_type, r.v, r.c, r.cumb, nn.n,
           |    CAST(CAST(('0x' || substr(md5(r.event_type || ':' ||
           |        CAST(r.v AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE)
           |      / CAST(4503599627370496 AS DOUBLE) AS u
           |  FROM r JOIN nn ON nn.event_type = r.event_type),
           |sc2 AS (SELECT event_type, v, c, cumb, n,
           |    $score AS score FROM sc),
           |win AS (SELECT event_type, v AS dp_median_c FROM (
           |    SELECT event_type, v, ROW_NUMBER() OVER (
           |      PARTITION BY event_type ORDER BY score DESC, v) AS rn
           |    FROM sc2) t WHERE rn = 1),
           |med AS (SELECT event_type,
           |    MIN(CASE WHEN cumb + c >= (n + 1) // 2 THEN v END)
           |      AS true_median_c
           |  FROM sc2 GROUP BY 1)
           |SELECT m.event_type, nn.n, m.true_median_c, w.dp_median_c,
           |  ABS(w.dp_median_c - m.true_median_c) AS abs_err_c
           |FROM med m JOIN win w ON w.event_type = m.event_type
           |JOIN nn ON nn.event_type = m.event_type
           |ORDER BY m.event_type""".stripMargin
      }) { (s, dir) =>
      val score = "CAST(-ABS(2 * cumb + c - n) AS DOUBLE) / 4" +
        " - ln(-ln(greatest(u," +
        " CAST(2.220446049250313e-16 AS DOUBLE))))"
      val h = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
        .agg(count(lit(1)).as("c"))
      val cw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val nn = h.groupBy(col("event_type"))
        .agg(sum(col("c")).cast("long").as("n"))
      val sc = h
        .withColumn("cumb", coalesce(sum(col("c")).over(cw), lit(0L)))
        .join(broadcast(nn), Seq("event_type"))
        .withColumn("u",
          Md5Prefix.md5_prefix_long(
            concat(col("event_type"), lit(":"),
              col("v").cast("string")), 13).cast("double") /
            lit(4503599627370496L).cast("double"))
        .withColumn("score", expr(score))
      val win = sc.groupBy(col("event_type"))
        .agg(max_by(col("v"),
          struct(col("score"), (lit(0L) - col("v"))))
          .as("dp_median_c"))
      val med = sc.groupBy(col("event_type"))
        .agg(expr("MIN(CASE WHEN cumb + c >= (n + 1) div 2 THEN v END)")
          .as("true_median_c"))
      med.join(win, Seq("event_type")).join(broadcast(nn),
          Seq("event_type"))
        .select(col("event_type"), col("n"), col("true_median_c"),
          col("dp_median_c"),
          abs(col("dp_median_c") - col("true_median_c"))
            .as("abs_err_c"))
        .orderBy(col("event_type"))
    })
}
