package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Cols._
import graft.functions.{AsOfJoin, Materialize, PrefixSum, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering and experimentation operators a training-data
  * pipeline layers on top of the event/document tables: marketing
  * attribution (the canonical event-stream credit assignment),
  * rank-based two-sample testing, target encoding, and the hashing
  * trick.
  *
  * Scale notes (100 TB): attribution rides the existing temporal-join
  * machinery — [[AsOfJoin]] for last-touch (merge-and-forward-fill, no
  * per-key sort-in-window) and [[RangeJoin]] for the windowed
  * multi-touch pair surface (bucketed equi-join, ≤ 2 replicas per
  * 7-day window). Mann-Whitney folds the two samples to a per-distinct-
  * value histogram and ranks it with the range-partitioned two-pass
  * [[PrefixSum]] — no global sort, no unpartitioned window, and the
  * ×2-scaled rank sums stay exact integers so the hash compare is
  * strict. Credit splits use integer micro-credits (floor(1e6 / n))
  * for the same reason: fractional credit would sum order-dependently
  * in floating point.
  */
object FeatureOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)
  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** Touch events (click/view), deduped to one row per (user, ts) so
    * the as-of tie-break is deterministic in both engines.
    */
  private def touches(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("touch_id"),
        max_by(col("event_type"), col("event_id")).as("touch_type"))

  /** Shared two-sample (click vs view) per-distinct-value histogram
    * CTEs for the ECDF/rank test family (CvM, Anderson–Darling,
    * Brunner–Munzel): per-value counts c1/c2, inclusive cumulatives,
    * totals. Spark mirrors through [[twoSampleCums]].
    */
  private val twoSampleHistCtes: String =
    """s AS (
      |  SELECT value,
      |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY 1),
      |r AS (SELECT c1, c2,
      |    SUM(c1) OVER wo AS cum1, SUM(c2) OVER wo AS cum2
      |  FROM s WINDOW wo AS (ORDER BY value
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |    CAST(SUM(c2) AS BIGINT) AS n2 FROM s)""".stripMargin

  /** Spark side of [[twoSampleHistCtes]]: (value, c1, c2, cum1, cum2)
    * through the range-partitioned two-pass [[PrefixSum]] — no global
    * sort, no unpartitioned window. Totals read off max(cum). */
  private def twoSampleCums(s: SparkSession, dir: String): DataFrame = {
    val hist = events(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("c1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("c2"))
    PrefixSum.globalCumsumMulti(hist, Seq(col("value")),
      Seq(col("c1") -> "cum1", col("c2") -> "cum2"))
  }

  /** Shared Welch t / degrees-of-freedom expression text — compiled by
    * BOTH engines over identical exact-moment inputs (n1, n2 integer;
    * s1, s2, q1, q2 decimal-exact doubles), so every double op runs in
    * the same IEEE order. Degenerate samples (n ≤ 1, zero variance)
    * stay NULL instead of ±inf.
    */
  private object Welch {
    private def v(n: String, sm: String, q: String) =
      s"(($q - $sm * $sm / CAST($n AS DOUBLE)) / CAST($n - 1 AS DOUBLE))"
    private val se2 =
      s"(${v("n1", "s1", "q1")} / CAST(n1 AS DOUBLE)" +
        s" + ${v("n2", "s2", "q2")} / CAST(n2 AS DOUBLE))"
    val t: String =
      s"""CASE WHEN n1 > 1 AND n2 > 1 AND $se2 > 0 THEN
         |  (s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
         |    / sqrt($se2) END""".stripMargin.replace("\n", " ")
    val df: String =
      s"""CASE WHEN n1 > 1 AND n2 > 1 AND $se2 > 0 THEN
         |  $se2 * $se2 / (
         |    ${v("n1", "s1", "q1")} * ${v("n1", "s1", "q1")}
         |      / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
         |        * CAST(n1 - 1 AS DOUBLE))
         |    + ${v("n2", "s2", "q2")} * ${v("n2", "s2", "q2")}
         |      / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
         |        * CAST(n2 - 1 AS DOUBLE))) END""".stripMargin
        .replace("\n", " ")
  }

  /** Shared z-statistic expression text for the Mann-Whitney gate —
    * compiled by BOTH engines over the identical exact-integer inputs
    * (n1, n2, u1_x2), so every double op runs in the same IEEE order.
    */
  private val MwZ =
    """CASE WHEN n1 > 0 AND n2 > 0 THEN
      |  (CAST(u1_x2 AS DOUBLE) / 2
      |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
      |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |      * CAST(n1 + n2 + 1 AS DOUBLE) / 12)
      |END""".stripMargin.replace("\n", " ")

  /** Shared CUPED expression text (same bit-exactness contract as
    * [[Welch]]): pooled θ = cov(x,y)/var(x) from global integer
    * moments (n, sx, sy, sxx, sxy), per-variant adjusted mean and
    * variance-reduction ratio from per-variant integer moments
    * (nv, sxv, syv, sxxv, sxyv, syyv). Degenerate inputs (zero
    * pre-period variance, single-user variant, zero y-variance) stay
    * NULL/unadjusted instead of dividing by zero under ANSI.
    */
  private object Cuped {
    private val num =
      "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    private val den =
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val theta: String =
      s"(CASE WHEN $den <> 0 THEN $num / $den ELSE CAST(0 AS DOUBLE) END)"
    val meanY: String = "(CAST(syv AS DOUBLE) / CAST(nv AS DOUBLE))"
    val meanYAdj: String =
      s"($meanY - $theta * (CAST(sxv AS DOUBLE) / CAST(nv AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))"
    private val varY =
      "((CAST(syyv AS DOUBLE) - CAST(syv AS DOUBLE) * CAST(syv AS DOUBLE)" +
        " / CAST(nv AS DOUBLE)) / CAST(nv - 1 AS DOUBLE))"
    private val varX =
      "((CAST(sxxv AS DOUBLE) - CAST(sxv AS DOUBLE) * CAST(sxv AS DOUBLE)" +
        " / CAST(nv AS DOUBLE)) / CAST(nv - 1 AS DOUBLE))"
    private val covXY =
      "((CAST(sxyv AS DOUBLE) - CAST(sxv AS DOUBLE) * CAST(syv AS DOUBLE)" +
        " / CAST(nv AS DOUBLE)) / CAST(nv - 1 AS DOUBLE))"
    private val varYAdj =
      s"($varY - CAST(2 AS DOUBLE) * $theta * $covXY" +
        s" + $theta * $theta * $varX)"
    val varReduction: String =
      s"(CASE WHEN nv > 1 AND $varY > 0 THEN $varYAdj / $varY END)"
  }

  def specs: Seq[QuerySpec] = Seq(
    // Last-touch attribution: each purchase is credited to the most
    // recent prior click/view by the same user — the as-of backward
    // join applied to the marketing credit-assignment problem.
    QuerySpec.sql(
      "attr_last_touch",
      """WITH tch AS (
        |  SELECT user_id, ts, CAST(MAX(event_id) AS BIGINT) AS touch_id,
        |    max_by(event_type, event_id) AS touch_type
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  tch.touch_id, tch.touch_type
        |FROM p ASOF LEFT JOIN tch
        |  ON p.user_id = tch.user_id AND tch.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val p = events(s, dir).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.asofBackward(p, "user_id", "ts",
          touches(s, dir), "user_id", "ts",
          Seq("touch_id", "touch_type"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("touch_id"), col("touch_type"))
        .orderBy(col("event_id"))
    },

    // Linear (equal-credit) multi-touch attribution: every purchase
    // splits 1e6 integer micro-credits evenly across its touches in
    // the preceding 7 days, totalled per touch type. The pair surface
    // is the bucketed range join; the per-purchase touch count joins
    // back on the purchase key — no window, all-integer credit math.
    QuerySpec.sql(
      "attr_linear",
      """WITH tch AS (SELECT user_id, ts, event_type AS touch_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT p.event_id, tch.touch_type
        |  FROM p JOIN tch ON tch.user_id = p.user_id
        |    AND tch.ts >= p.ts - INTERVAL 7 DAY AND tch.ts < p.ts),
        |n AS (SELECT event_id, COUNT(*) AS n_touch FROM pairs GROUP BY 1)
        |SELECT touch_type,
        |  CAST(SUM(1000000 // n_touch) AS BIGINT) AS credit_micro,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM pairs JOIN n USING (event_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val dayUs = 86400000000L
      val p = events(s, dir).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
        .withColumn("w_start", col("p_us") - lit(7L * dayUs))
      val tch = events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("touch_type"),
          unix_micros(col("ts")).as("t_us"))
      val pairs = RangeJoin.pointInInterval(
          p, "user_id", "w_start", "p_us",
          tch, "user_id", "t_us", bucketUs = 7L * dayUs)
        .select(col("i_event_id").as("event_id"), col("p_touch_type"))
      // per-purchase touch count as a KEYED window (bounded rows per
      // purchase) — one pass over the pair surface instead of a
      // groupBy + join-back that would evaluate the range join twice
      pairs.withColumn("n_touch", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_id"))))
        .groupBy(col("p_touch_type").as("touch_type"))
        .agg(sum(expr("1000000 div n_touch")).cast("long").as("credit_micro"),
          count(lit(1)).as("n_pairs"))
        .orderBy(col("touch_type"))
    },

    // Markov-chain (removal-effect) attribution — the model-based
    // third member of the attribution family: journeys are per-user
    // touch sequences split at purchases (absorbing CONV; an
    // unconverted journey tail absorbs into NULL), and a channel's
    // credit is how much the START→CONV absorption probability DROPS
    // when that channel's node is knocked out (mass entering it
    // rerouted to NULL). Absorption runs 12 power-iteration rounds in
    // integer ppb mass (the events_markov_stationary discipline —
    // floor(c·mass/rowtotal), bit-deterministic at any parallelism),
    // and all knockout variants iterate TOGETHER as one
    // (variant, state) keyed table — each round is a single join
    // against the |states|²-bounded transition table, broadcastable
    // at any event volume; only the ONE windowed pass building the
    // transitions touches raw events.
    QuerySpec.sql(
      "attr_markov_removal", {
        val iters = 12
        def step(prev: String) =
          s"""SELECT variant, st,
             |  CASE WHEN st = 'CONV' THEN 1000000000
             |    WHEN st = 'NULL' OR st = variant THEN 0
             |    ELSE flow END AS mass
             |FROM (
             |  SELECT v.variant, s.st,
             |    CAST(COALESCE(SUM(tc.c * p.mass // rt.n), 0)
             |      AS BIGINT) AS flow
             |  FROM variants v CROSS JOIN states s
             |  LEFT JOIN tc ON tc.f = s.st
             |  LEFT JOIN rt ON rt.f = s.st
             |  LEFT JOIN $prev p ON p.variant = v.variant
             |    AND p.st = tc.t
             |  GROUP BY 1, 2) q""".stripMargin
        val ladder = (1 to iters)
          .map(i => s"p$i AS (${step(s"p${i - 1}")})").mkString(",\n")
        s"""WITH e AS (
           |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
           |  FROM events),
           |j AS (
           |  SELECT user_id, us, event_id, event_type,
           |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1
           |      ELSE 0 END) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS jid
           |  FROM e),
           |tr AS (
           |  SELECT COALESCE(LAG(event_type) OVER (
           |      PARTITION BY user_id, jid ORDER BY us, event_id),
           |      'START') AS f,
           |    CASE WHEN event_type = 'purchase' THEN 'CONV'
           |      ELSE event_type END AS t
           |  FROM j),
           |ends AS (
           |  SELECT event_type AS f, 'NULL' AS t
           |  FROM (SELECT event_type, ROW_NUMBER() OVER (
           |      PARTITION BY user_id, jid
           |      ORDER BY us DESC, event_id DESC) AS rn FROM j) z
           |  WHERE rn = 1 AND event_type <> 'purchase'),
           |tc AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM (SELECT f, t FROM tr
           |    UNION ALL SELECT f, t FROM ends) u
           |  GROUP BY 1, 2),
           |rt AS (SELECT f, CAST(SUM(c) AS BIGINT) AS n
           |  FROM tc GROUP BY 1),
           |ch AS (SELECT DISTINCT event_type AS st FROM e
           |  WHERE event_type <> 'purchase'),
           |states AS (SELECT st FROM ch
           |  UNION ALL SELECT UNNEST(['START', 'CONV', 'NULL'])),
           |variants AS (SELECT 'full' AS variant
           |  UNION ALL SELECT st FROM ch),
           |p0 AS (SELECT variant, st,
           |    CAST(CASE WHEN st = 'CONV' THEN 1000000000 ELSE 0 END
           |      AS BIGINT) AS mass
           |  FROM variants CROSS JOIN states),
           |$ladder
           |SELECT w.variant AS channel, f.mass AS p_conv_full_ppb,
           |  w.mass AS p_conv_removed_ppb,
           |  CAST(CASE WHEN f.mass > 0 THEN
           |    (f.mass - w.mass) * 1000000 // f.mass END AS BIGINT)
           |    AS removal_effect_ppm
           |FROM p$iters w
           |JOIN p$iters f ON f.variant = 'full' AND f.st = 'START'
           |WHERE w.st = 'START' AND w.variant <> 'full'
           |ORDER BY channel""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val iters = 12
      val e = events(s, dir).select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val j = e.withColumn("jid",
        coalesce(sum(when(col("event_type") === "purchase", 1)
          .otherwise(0))
          .over(wu.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      val wj = Window.partitionBy(col("user_id"), col("jid"))
        .orderBy(col("us"), col("event_id"))
      val tr = j.select(
        coalesce(lag(col("event_type"), 1).over(wj), lit("START"))
          .as("f"),
        when(col("event_type") === "purchase", "CONV")
          .otherwise(col("event_type")).as("t"))
      val ends = j.withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("jid"))
            .orderBy(col("us").desc, col("event_id").desc)))
        .filter(col("rn") === 1 && col("event_type") =!= "purchase")
        .select(col("event_type").as("f"), lit("NULL").as("t"))
      // The transition matrix lives on the EVENT-TYPE domain — at
      // most (k+2)² cells however many events fed it — so the 12
      // absorption rounds run on the driver over the collected
      // matrix (the bounded-collect pattern: centroids, codebooks,
      // the 64-row ER dictionary), in the exact integer arithmetic
      // the oracle unrolls. Distributing a ≤64-cell fixpoint would
      // spend 12 scheduler rounds on zero data.
      val tcRows = tr.union(ends).groupBy(col("f"), col("t"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(tcRows.length <= 256,
        s"event-type domain unexpectedly large (${tcRows.length} " +
          "transition cells): absorption matrix no longer bounded")
      val rowTot = tcRows.groupBy(_._1).map { case (f, rs) =>
        f -> rs.map(_._3).sum }
      val channels = (tcRows.map(_._1) ++ tcRows.map(_._2)).distinct
        .filterNot(Set("START", "CONV", "NULL")).sorted
      val statesAll = (channels ++ Seq("START", "CONV", "NULL"))
      def absorb(removed: Option[String]): Long = {
        var mass = statesAll.map(st =>
          st -> (if (st == "CONV") 1000000000L else 0L)).toMap
        for (_ <- 1 to iters) {
          val next = statesAll.map { st =>
            val m =
              if (st == "CONV") 1000000000L
              else if (st == "NULL" || removed.contains(st)) 0L
              else tcRows.iterator.filter(_._1 == st)
                .map { case (f, t, c) =>
                  Math.floorDiv(c * mass(t), rowTot(f)) }.sum
            st -> m
          }.toMap
          mass = next
        }
        mass("START")
      }
      val pFull = absorb(None)
      val out = channels.toSeq.map { c =>
        val pRem = absorb(Some(c))
        (c, pFull, pRem,
          if (pFull > 0)
            Some(Math.floorDiv((pFull - pRem) * 1000000L, pFull))
          else Option.empty[Long])
      }
      out.toDF("channel", "p_conv_full_ppb", "p_conv_removed_ppb",
          "removal_effect_ppm")
        .orderBy(col("channel"))
    },

    // Mann-Whitney U: are click values drawn from the same
    // distribution as view values? Folded to the per-distinct-value
    // histogram, ranked by the two-pass prefix sum (avg rank of a
    // tied run = exclusive-cum + (n+1)/2, kept ×2 so it stays an
    // exact integer), then the closed-form U and normal-approximation
    // z over the exact sums.
    QuerySpec.sql(
      "stats_mannwhitney",
      s"""WITH s AS (
         |  SELECT value,
         |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
         |    COUNT(*) AS c
         |  FROM events WHERE event_type IN ('click', 'view')
         |  GROUP BY 1),
         |r AS (SELECT value, c1, c,
         |    COALESCE(SUM(c) OVER (ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
         |  FROM s),
         |agg AS (SELECT
         |    CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c - c1) AS BIGINT) AS n2,
         |    CAST(SUM(c1 * (2 * cumb + c + 1)) AS BIGINT) AS r1_x2
         |  FROM r),
         |u AS (SELECT n1, n2, r1_x2 - n1 * (n1 + 1) AS u1_x2 FROM agg)
         |SELECT n1, n2, CAST(u1_x2 AS BIGINT) AS u1_x2, $MwZ AS z
         |FROM u""".stripMargin) { (s, dir) =>
      val hist = events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .groupBy(col("value"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c1"), count(lit(1)).as("c"))
      val ranked = PrefixSum.globalCumsum(hist, Seq(col("value")),
          col("c"), "cum")
        .withColumn("cumb", col("cum") - col("c"))
      ranked.agg(
          sum(col("c1")).cast("long").as("n1"),
          sum(col("c") - col("c1")).cast("long").as("n2"),
          sum(col("c1") * (lit(2) * col("cumb") + col("c") + lit(1)))
            .cast("long").as("r1_x2"))
        .withColumn("u1_x2",
          (col("r1_x2") - col("n1") * (col("n1") + lit(1))).cast("long"))
        .withColumn("z", expr(MwZ))
        .select(col("n1"), col("n2"), col("u1_x2"), col("z"))
    },

    // Smoothed target encoding (m-estimate, m = 10): the categorical
    // feature p_brand encoded as a shrunk mean of the retail price —
    // two hash aggregates and a 1-row broadcast global mean, the
    // standard leakage-safe categorical encoder at corpus scale.
    // Decision-stump split search — the inner loop of every tree
    // learner: for each candidate threshold on the balance-bucket
    // feature, the weighted Gini impurity of the (left, right)
    // partition predicting the segment label. All integer: per-class
    // counts cumulate per label (keyed window over the tiny
    // bucket×label grid), n²−Σc² forms the impurity numerators, and
    // the weighted sum is one exact rational scaled to ppm (HUGEINT
    // in DuckDB / DECIMAL div in Spark — the supplier_hhi
    // discipline). The best split is simply the min gini_ppm row.
    QuerySpec.sql(
      "feat_gini_split",
      """WITH cb AS (
        |  SELECT CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bucket,
        |    c_mktsegment AS label, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM customer GROUP BY 1, 2),
        |bks AS (SELECT DISTINCT bucket FROM cb),
        |lbs AS (SELECT label, CAST(SUM(c) AS BIGINT) AS ct
        |  FROM cb GROUP BY 1),
        |n AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM lbs),
        |grid AS (
        |  SELECT b.bucket, l.label, l.ct, COALESCE(cb.c, 0) AS c
        |  FROM bks b CROSS JOIN lbs l
        |  LEFT JOIN cb ON cb.bucket = b.bucket AND cb.label = l.label),
        |cum AS (
        |  SELECT bucket, label, ct,
        |    SUM(c) OVER (PARTITION BY label ORDER BY bucket) AS cl
        |  FROM grid),
        |cand AS (
        |  SELECT bucket AS threshold,
        |    CAST(SUM(cl) AS BIGINT) AS n_left,
        |    CAST(SUM(cl * cl) AS BIGINT) AS s_left,
        |    CAST(SUM(ct - cl) AS BIGINT) AS n_right,
        |    CAST(SUM((ct - cl) * (ct - cl)) AS BIGINT) AS s_right
        |  FROM cum GROUP BY 1)
        |SELECT threshold, n_left, n_right,
        |  CAST(((n_left * n_left - s_left) * n_right
        |      + (n_right * n_right - s_right) * n_left)
        |      * CAST(1000000 AS HUGEINT)
        |    // (CAST(n.n AS HUGEINT) * n_left * n_right) AS BIGINT)
        |    AS gini_ppm
        |FROM cand, n
        |WHERE n_left > 0 AND n_right > 0
        |ORDER BY threshold""".stripMargin) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val cb = t(s, dir, "customer")
        .groupBy(floor(col("c_acctbal") / 1000).cast("long").as("bucket"),
          col("c_mktsegment").as("label"))
        .agg(count(lit(1)).as("c"))
      val bks = cb.select(col("bucket")).distinct()
      val lbs = cb.groupBy(col("label")).agg(sum(col("c")).as("ct"))
      val nTot = lbs.agg(sum(col("ct")).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(col("bucket"))
      val cum = bks.crossJoin(broadcast(lbs))
        .join(cb, Seq("bucket", "label"), "left")
        .select(col("bucket"), col("label"), col("ct"),
          coalesce(col("c"), lit(0L)).as("c"))
        .withColumn("cl", sum(col("c")).over(w))
      cum.groupBy(col("bucket").as("threshold"))
        .agg(sum(col("cl")).as("n_left"),
          sum(col("cl") * col("cl")).as("s_left"),
          sum(col("ct") - col("cl")).as("n_right"),
          sum((col("ct") - col("cl")) * (col("ct") - col("cl")))
            .as("s_right"))
        .filter(col("n_left") > 0 && col("n_right") > 0)
        .crossJoin(broadcast(nTot))
        .select(col("threshold"), col("n_left"), col("n_right"),
          expr("CAST((CAST((n_left * n_left - s_left) AS DECIMAL(38,0))" +
            " * n_right + CAST((n_right * n_right - s_right) AS DECIMAL(38,0))" +
            " * n_left) * 1000000" +
            " div (CAST(n AS DECIMAL(38,0)) * n_left * n_right)" +
            " AS BIGINT)").as("gini_ppm"))
        .orderBy(col("threshold"))
    },

    // Weight-of-evidence encoding + information value — the credit-
    // scoring categorical encoder: per category, ln of the class-share
    // ratio, and the IV contribution that ranks features by
    // separating power. Exact integer class counts (one conditional-
    // aggregate scan), zero-class categories NULL-guarded, the two
    // float formulas compiled from one shared expression text.
    QuerySpec.sql(
      "feat_woe_encode", {
        val woe =
          "CASE WHEN np > 0 AND nn > 0 AND tp > 0 AND tn > 0 THEN" +
            " ln((CAST(np AS DOUBLE) / CAST(tp AS DOUBLE))" +
            " / (CAST(nn AS DOUBLE) / CAST(tn AS DOUBLE))) END"
        val iv =
          s"(CAST(np AS DOUBLE) / CAST(tp AS DOUBLE)" +
            s" - CAST(nn AS DOUBLE) / CAST(tn AS DOUBLE)) * ($woe)"
        s"""WITH c AS (
           |  SELECT o_orderpriority,
           |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS np,
           |    CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS nn
           |  FROM orders GROUP BY 1),
           |t AS (SELECT CAST(SUM(np) AS BIGINT) AS tp,
           |    CAST(SUM(nn) AS BIGINT) AS tn FROM c)
           |SELECT o_orderpriority, np, nn,
           |  CAST(CAST($woe AS DECIMAL(18,6)) AS DOUBLE) AS woe,
           |  CAST(CAST($iv AS DECIMAL(18,6)) AS DOUBLE) AS iv_part
           |FROM c, t
           |ORDER BY o_orderpriority""".stripMargin
      }) { (s, dir) =>
      val woe =
        "CASE WHEN np > 0 AND nn > 0 AND tp > 0 AND tn > 0 THEN" +
          " ln((CAST(np AS DOUBLE) / CAST(tp AS DOUBLE))" +
          " / (CAST(nn AS DOUBLE) / CAST(tn AS DOUBLE))) END"
      val iv =
        s"(CAST(np AS DOUBLE) / CAST(tp AS DOUBLE)" +
          s" - CAST(nn AS DOUBLE) / CAST(tn AS DOUBLE)) * ($woe)"
      val c = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("np"),
          sum(when(col("o_orderstatus") =!= "F", 1L).otherwise(0L))
            .as("nn"))
      val tot = c.agg(sum(col("np")).as("tp"), sum(col("nn")).as("tn"))
      c.crossJoin(broadcast(tot))
        .select(col("o_orderpriority"), col("np"), col("nn"),
          expr(woe).cast("decimal(18,6)").cast("double").as("woe"),
          expr(iv).cast("decimal(18,6)").cast("double").as("iv_part"))
        .orderBy(col("o_orderpriority"))
    },

    QuerySpec.sql(
      "feat_target_encode",
      """WITH g AS (SELECT
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
        |      / COUNT(*) AS gmean
        |  FROM part),
        |b AS (SELECT p_brand, COUNT(*) AS n,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS ssum
        |  FROM part GROUP BY 1)
        |SELECT p_brand, CAST(n AS BIGINT) AS n,
        |  (ssum + 10 * gmean) / (n + 10) AS target_enc
        |FROM b, g ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val part = t(s, dir, "part")
      val g = part.agg(
        (widedsum(col("p_retailprice")) / count(lit(1))).as("gmean"))
      part.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), widedsum(col("p_retailprice")).as("ssum"))
        .crossJoin(broadcast(g))
        .select(col("p_brand"), col("n").cast("long").as("n"),
          ((col("ssum") + lit(10) * col("gmean")) / (col("n") + lit(10)))
            .as("target_enc"))
        .orderBy(col("p_brand"))
    },

    // Mutual information I(feature; label) for three categorical
    // candidates against l_returnflag — the model-free feature-
    // selection ranking. ONE fact scan fans each row into the three
    // (feature, value, label) cells via stack() and collapses map-side
    // to the value-domain-sized contingency table; marginals, ln
    // ratios, and the MI sum are all arithmetic over that tiny table.
    // Each cell's ln(N·c_xy/(c_x·c_y)) is micro-quantized (the
    // text_lm_score discipline) so Σ c_xy·lpm is an exact long and
    // the float appears only in the final per-feature division.
    QuerySpec.sql(
      "feat_mutual_info", {
        val lnRatio = "ln(CAST(n AS DOUBLE) * CAST(cxy AS DOUBLE)" +
          " / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))"
        s"""WITH cells AS (
           |  SELECT 'linestatus' AS feat, l_linestatus AS fv,
           |    l_returnflag AS y, CAST(COUNT(*) AS BIGINT) AS cxy
           |  FROM lineitem GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT 'qty', CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
           |    l_returnflag, CAST(COUNT(*) AS BIGINT)
           |  FROM lineitem GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT 'ship_month', CAST(month(l_shipdate) AS VARCHAR),
           |    l_returnflag, CAST(COUNT(*) AS BIGINT)
           |  FROM lineitem GROUP BY 1, 2, 3),
           |fm AS (SELECT feat, fv, CAST(SUM(cxy) AS BIGINT) AS cx
           |  FROM cells GROUP BY 1, 2),
           |ym AS (SELECT feat, y, CAST(SUM(cxy) AS BIGINT) AS cy
           |  FROM cells GROUP BY 1, 2),
           |nn AS (SELECT feat, CAST(SUM(cxy) AS BIGINT) AS n
           |  FROM cells GROUP BY 1),
           |lp AS (
           |  SELECT c.feat, c.cxy, n,
           |    CAST(CAST($lnRatio AS DECIMAL(18,6)) * 1000000 AS BIGINT)
           |      AS lpm
           |  FROM cells c JOIN fm USING (feat, fv)
           |    JOIN ym USING (feat, y) JOIN nn USING (feat)),
           |agg AS (
           |  SELECT feat AS feature, CAST(COUNT(*) AS BIGINT) AS n_cells,
           |    CAST(SUM(cxy * lpm) AS BIGINT) AS sm,
           |    CAST(MAX(n) AS BIGINT) AS n
           |  FROM lp GROUP BY 1)
           |SELECT feature, n_cells,
           |  CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000) AS mi_nats
           |FROM agg ORDER BY feature""".stripMargin
      }) { (s, dir) =>
      val lnRatio = "ln(CAST(n AS DOUBLE) * CAST(cxy AS DOUBLE)" +
        " / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))"
      val cells = t(s, dir, "lineitem")
        .selectExpr(
          "stack(3, 'linestatus', l_linestatus," +
            " 'qty', CAST(CAST(l_quantity AS BIGINT) AS STRING)," +
            " 'ship_month', CAST(month(l_shipdate) AS STRING))" +
            " AS (feat, fv)",
          "l_returnflag AS y")
        .groupBy(col("feat"), col("fv"), col("y"))
        .agg(count(lit(1)).as("cxy"))
      val fm = cells.groupBy(col("feat"), col("fv"))
        .agg(sum(col("cxy")).cast("long").as("cx"))
      val ym = cells.groupBy(col("feat"), col("y"))
        .agg(sum(col("cxy")).cast("long").as("cy"))
      val nn = cells.groupBy(col("feat"))
        .agg(sum(col("cxy")).cast("long").as("n"))
      cells
        .join(broadcast(fm), Seq("feat", "fv"))
        .join(broadcast(ym), Seq("feat", "y"))
        .join(broadcast(nn), Seq("feat"))
        .select(col("feat"), col("cxy"), col("n"),
          micros6(expr(lnRatio)).as("lpm"))
        .groupBy(col("feat").as("feature"))
        .agg(count(lit(1)).as("n_cells"),
          sum(col("cxy") * col("lpm")).cast("long").as("sm"),
          max(col("n")).as("n"))
        .select(col("feature"), col("n_cells"),
          expr("CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000)")
            .as("mi_nats"))
        .orderBy(col("feature"))
    },

    // Two-sample Kolmogorov-Smirnov: D = max |ECDF₁ − ECDF₂| between
    // click and view values. Same histogram-rank machinery as
    // Mann-Whitney — ONE multi-column prefix-sum pass carries both
    // samples' cumulative counts, and the sup statistic is maximized
    // over the integer cross-product form |cum1·n2 − cum2·n1| so the
    // argmax needs no float comparisons; only the final D divides.
    QuerySpec.sql(
      "stats_ks_twosample",
      """WITH s AS (
        |  SELECT value,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |r AS (SELECT
        |    SUM(c1) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |    SUM(c2) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        |  FROM s),
        |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM s)
        |SELECT n1, n2,
        |  CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
        |  CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d
        |FROM r, tot GROUP BY n1, n2""".stripMargin) { (s, dir) =>
      val hist = events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .groupBy(col("value"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("c2"))
      val cums = PrefixSum.globalCumsumMulti(hist, Seq(col("value")),
        Seq(col("c1") -> "cum1", col("c2") -> "cum2"))
      // totals = final cumulative values — read off the prefix-sum's
      // persisted range partitioning instead of rescanning events
      val tot = cums.agg(max(col("cum1")).cast("long").as("n1"),
        max(col("cum2")).cast("long").as("n2"))
      cums.crossJoin(broadcast(tot))
        .groupBy(col("n1"), col("n2"))
        .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
          .cast("long").as("d_num"))
        .withColumn("ks_d", col("d_num").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")))
        .select(col("n1"), col("n2"), col("d_num"), col("ks_d"))
    },

    // Two-sample Cramér–von Mises: the INTEGRATED squared ECDF gap
    // beside KS's sup gap (KS is sensitive to one large deviation,
    // CvM to many small ones — the standard pair). Evaluated at every
    // observation: T = Σ_v w·(cum1·n2 − cum2·n1)² / (n1·n2·N²) over
    // the per-distinct-value histogram — ENTIRELY exact integers, not
    // one float anywhere: the gap cross-product rides DECIMAL(38,0)/
    // HUGEINT (gap ≤ n1·n2, squared ~10¹⁷ at sf0.1), and T lands as
    // one truncating division to micro. Same [[PrefixSum]] two-pass
    // histogram machinery as KS/Mann-Whitney — no global sort, no
    // unpartitioned window.
    QuerySpec.sql(
      "stats_cvm_twosample",
      s"""WITH $twoSampleHistCtes,
         |dd AS (SELECT c1 + c2 AS w,
         |    cum1 * CAST(n2 AS HUGEINT) - cum2 * CAST(n1 AS HUGEINT)
         |      AS d
         |  FROM r, tot)
         |SELECT n1, n2,
         |  CAST(SUM(CAST(w AS HUGEINT) * d * d) * 1000000
         |    // (CAST(n1 AS HUGEINT) * n2 * (n1 + n2) * (n1 + n2))
         |    AS BIGINT) AS cvm_micro
         |FROM dd, tot GROUP BY n1, n2""".stripMargin) { (s, dir) =>
      val cums = twoSampleCums(s, dir)
      val tot = cums.agg(max(col("cum1")).cast("long").as("n1"),
        max(col("cum2")).cast("long").as("n2"))
      cums.crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          expr("cum1 * CAST(n2 AS DECIMAL(38,0)) " +
            "- cum2 * CAST(n1 AS DECIMAL(38,0))").as("d"),
          (col("c1") + col("c2")).as("w"))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(expr("w * d * d"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("st"))
        .select(col("n1"), col("n2"),
          expr("CAST(st * 1000000 div (CAST(n1 AS DECIMAL(38,0)) " +
            "* n2 * (n1 + n2) * (n1 + n2)) AS BIGINT)")
            .as("cvm_micro"))
    },

    // Two-sample Anderson–Darling: the ECDF-gap test that WEIGHTS the
    // tails (the 1/(k(N−k)) variance normalizer blows up at the
    // distribution edges, where KS and CvM are blind) — the standard
    // third member of the two-sample family. Tie-blocked discrete
    // form: one term per distinct value (block-end cumulatives M and
    // k, weighted by the block size w), which reduces to the classic
    // Σ_{k=1}^{N−1} (M_k·N − n1·k)²/(k(N−k)) when every multiplicity
    // is 1. Each term takes ONE truncating division to micro (the
    // per-group floor discipline of stats_anova_f — deterministic in
    // both engines, error < #distinct-values micro units on ~10¹⁶
    // magnitudes), folded in DECIMAL(38,0)/HUGEINT throughout; the
    // Spark floors use the subtract-remainder form so no intermediate
    // quotient squeezes through a LONG. Same PrefixSum histogram as
    // KS/CvM.
    QuerySpec.sql(
      "stats_anderson_darling",
      s"""WITH $twoSampleHistCtes,
         |terms AS (SELECT c1 + c2 AS w,
         |    cum1 * CAST(n1 + n2 AS HUGEINT)
         |      - CAST(n1 AS HUGEINT) * (cum1 + cum2) AS mn,
         |    CAST(cum1 + cum2 AS BIGINT) AS kk
         |  FROM r, tot WHERE cum1 + cum2 < n1 + n2)
         |SELECT n1, n2,
         |  CAST(SUM(CAST(w AS HUGEINT) * (mn * mn * 1000000
         |      // (kk * CAST(n1 + n2 - kk AS HUGEINT))))
         |    // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS a2_micro
         |FROM terms, tot GROUP BY n1, n2""".stripMargin) { (s, dir) =>
      val cums = twoSampleCums(s, dir)
      val tot = cums.agg(max(col("cum1")).cast("long").as("n1"),
        max(col("cum2")).cast("long").as("n2"))
      cums.crossJoin(broadcast(tot))
        .filter(col("cum1") + col("cum2") < col("n1") + col("n2"))
        .select(col("n1"), col("n2"),
          (col("c1") + col("c2")).as("w"),
          expr("cum1 * CAST(n1 + n2 AS DECIMAL(38,0)) " +
            "- CAST(n1 AS DECIMAL(38,0)) * (cum1 + cum2)").as("mn"),
          expr("CAST(cum1 + cum2 AS BIGINT)").as("kk"))
        .select(col("n1"), col("n2"), col("w"),
          // exact per-term floor without a LONG intermediate
          expr("CAST((mn * mn * 1000000 " +
            "- (mn * mn * 1000000) % (kk * CAST(n1 + n2 - kk " +
            "AS DECIMAL(38,0)))) / (kk * CAST(n1 + n2 - kk " +
            "AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("term"))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(expr("w * term"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("st"))
        .select(col("n1"), col("n2"),
          expr("CAST(st div (CAST(n1 AS DECIMAL(38,0)) * n2) " +
            "AS BIGINT)").as("a2_micro"))
    },

    // Brunner–Munzel: the modern two-sample location test — valid
    // under UNEQUAL variances and shapes, where Mann-Whitney's null
    // needs exchangeability (the test scipy/R recommend over U when
    // spread differs). Everything reduces to midrank placements over
    // the shared histogram: p̂ = P(X<Y) + ½P(X=Y) is the exact ppm
    // rational T2/(2·n1·n2); the placement variances fold as
    // V_i = Σ c_i·(n_i·P_i − T_i)² in DECIMAL(38,0)/HUGEINT and land
    // as exact micro integers S_i² = V_i/(4n_i²(n_i−1)); the
    // studentized statistic is ONE shared-text IEEE chain over those
    // int64s (the LinReg discipline — int64→double is correctly
    // rounded in both engines). BIGINT envelope: n_i·P_i ≤ 2·n_i·N
    // and n_i·s_i_micro stay under 2⁶³ to ~10⁶-row samples; beyond
    // that the placement products move to DECIMAL(38,0) like the
    // variance fold already does.
    QuerySpec.sql(
      "stats_brunner_munzel",
      s"""WITH $twoSampleHistCtes,
         |pl AS (SELECT c1, c2,
         |    2 * (cum2 - c2) + c2 AS p1x2,
         |    2 * (cum1 - c1) + c1 AS p2x2,
         |    2 * (cum1 + cum2 - c1 - c2) + c1 + c2 + 1 AS rx2
         |  FROM r),
         |t AS (SELECT
         |    CAST(SUM(c1 * p1x2) AS BIGINT) AS t1,
         |    CAST(SUM(c2 * p2x2) AS BIGINT) AS t2,
         |    CAST(SUM(c1 * rx2) AS BIGINT) AS r1x2,
         |    CAST(SUM(c2 * rx2) AS BIGINT) AS r2x2
         |  FROM pl),
         |v AS (SELECT
         |    CAST(SUM(CAST(c1 AS HUGEINT) * (n1 * p1x2 - t1)
         |      * (n1 * p1x2 - t1)) AS HUGEINT) AS v1,
         |    CAST(SUM(CAST(c2 AS HUGEINT) * (n2 * p2x2 - t2)
         |      * (n2 * p2x2 - t2)) AS HUGEINT) AS v2
         |  FROM pl, t, tot),
         |sm AS (SELECT n1, n2, r1x2, r2x2, t2,
         |    CAST(v1 * 1000000
         |      // (4 * CAST(n1 AS HUGEINT) * n1 * (n1 - 1)) AS BIGINT)
         |      AS s1m,
         |    CAST(v2 * 1000000
         |      // (4 * CAST(n2 AS HUGEINT) * n2 * (n2 - 1)) AS BIGINT)
         |      AS s2m
         |  FROM t, v, tot WHERE n1 > 1 AND n2 > 1)
         |SELECT n1, n2,
         |  CAST(t2 * 1000000 // (2 * n1 * n2) AS BIGINT) AS p_hat_ppm,
         |  s1m AS s1_micro, s2m AS s2_micro,
         |  CASE WHEN n1 * s1m + n2 * s2m > 0 THEN
         |    CAST(n1 * r2x2 - n2 * r1x2 AS DOUBLE)
         |      / (2 * CAST(n1 + n2 AS DOUBLE)
         |        * sqrt((CAST(n1 AS DOUBLE) * CAST(s1m AS DOUBLE)
         |          + CAST(n2 AS DOUBLE) * CAST(s2m AS DOUBLE))
         |          / 1000000.0))
         |  END AS w_bm
         |FROM sm""".stripMargin) { (s, dir) =>
      val D = org.apache.spark.sql.types.DecimalType(38, 0)
      val cums = Materialize.stable(twoSampleCums(s, dir))
      val tot = cums.agg(max(col("cum1")).cast("long").as("n1"),
        max(col("cum2")).cast("long").as("n2"))
      val pl = cums.select(col("c1"), col("c2"),
        expr("2 * (cum2 - c2) + c2").as("p1x2"),
        expr("2 * (cum1 - c1) + c1").as("p2x2"),
        expr("2 * (cum1 + cum2 - c1 - c2) + c1 + c2 + 1").as("rx2"))
      val t0 = pl.agg(
        sum(col("c1") * col("p1x2")).cast("long").as("t1"),
        sum(col("c2") * col("p2x2")).cast("long").as("t2"),
        sum(col("c1") * col("rx2")).cast("long").as("r1x2"),
        sum(col("c2") * col("rx2")).cast("long").as("r2x2"))
      val v0 = pl.crossJoin(broadcast(t0)).crossJoin(broadcast(tot))
        .agg(
          sum(expr("CAST(c1 AS DECIMAL(38,0)) * (n1 * p1x2 - t1) " +
            "* (n1 * p1x2 - t1)")).cast(D).as("v1"),
          sum(expr("CAST(c2 AS DECIMAL(38,0)) * (n2 * p2x2 - t2) " +
            "* (n2 * p2x2 - t2)")).cast(D).as("v2"))
      t0.crossJoin(broadcast(v0)).crossJoin(broadcast(tot))
        .filter(col("n1") > 1 && col("n2") > 1)
        .select(col("n1"), col("n2"), col("r1x2"), col("r2x2"),
          col("t2"),
          expr("CAST(v1 * 1000000 div (4 * CAST(n1 AS DECIMAL(38,0)) " +
            "* n1 * (n1 - 1)) AS BIGINT)").as("s1m"),
          expr("CAST(v2 * 1000000 div (4 * CAST(n2 AS DECIMAL(38,0)) " +
            "* n2 * (n2 - 1)) AS BIGINT)").as("s2m"))
        .select(col("n1"), col("n2"),
          expr("CAST(t2 * 1000000 div (2 * n1 * n2) AS BIGINT)")
            .as("p_hat_ppm"),
          col("s1m").as("s1_micro"), col("s2m").as("s2_micro"),
          expr("""CASE WHEN n1 * s1m + n2 * s2m > 0 THEN
            |    CAST(n1 * r2x2 - n2 * r1x2 AS DOUBLE)
            |      / (2 * CAST(n1 + n2 AS DOUBLE)
            |        * sqrt((CAST(n1 AS DOUBLE) * CAST(s1m AS DOUBLE)
            |          + CAST(n2 AS DOUBLE) * CAST(s2m AS DOUBLE))
            |          / 1000000.0))
            |  END""".stripMargin).as("w_bm"))
    },

    // Welch's unequal-variance t-test between click and view values:
    // one conditional-aggregate pass collects both samples' exact
    // moment sums (decimal-exact, so the doubles the closed form sees
    // are identical in both engines), then t and the Welch-
    // Satterthwaite df evaluate per the shared expression text.
    // CUPED variance reduction — the experimentation-platform
    // workhorse: adjust each user's experiment-period metric by their
    // pre-period covariate (y* = y − θ(x − x̄), θ = cov(x,y)/var(x)
    // pooled) and report per-variant adjusted means + the achieved
    // variance-reduction ratio. Everything flows through EXACT integer
    // sufficient statistics (x and y are event counts; moments are
    // long sums at user grain → variant grain → a 2-row global fold),
    // and every float op compiles from the one shared expression text
    // in both engines. Shape: two keyed aggregates + a broadcast of
    // the 1-row global moments.
    QuerySpec.sql(
      "stats_cuped_adjust", {
        s"""WITH u AS (
           |  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
           |    CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
           |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
           |    CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 15
           |      THEN 1 ELSE 0 END) AS BIGINT) AS y
           |  FROM events GROUP BY 1, 2),
           |v AS (
           |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS nv,
           |    CAST(SUM(x) AS BIGINT) AS sxv,
           |    CAST(SUM(y) AS BIGINT) AS syv,
           |    CAST(SUM(x * x) AS BIGINT) AS sxxv,
           |    CAST(SUM(x * y) AS BIGINT) AS sxyv,
           |    CAST(SUM(y * y) AS BIGINT) AS syyv
           |  FROM u GROUP BY 1),
           |g AS (
           |  SELECT CAST(SUM(nv) AS BIGINT) AS n,
           |    CAST(SUM(sxv) AS BIGINT) AS sx,
           |    CAST(SUM(syv) AS BIGINT) AS sy,
           |    CAST(SUM(sxxv) AS BIGINT) AS sxx,
           |    CAST(SUM(sxyv) AS BIGINT) AS sxy
           |  FROM v)
           |SELECT variant, nv AS n_users,
           |  CAST(CAST(${Cuped.meanY} AS DECIMAL(18,6)) AS DOUBLE)
           |    AS mean_y,
           |  CAST(CAST(${Cuped.meanYAdj} AS DECIMAL(18,6)) AS DOUBLE)
           |    AS mean_y_adj,
           |  CAST(CAST(${Cuped.varReduction} AS DECIMAL(18,6)) AS DOUBLE)
           |    AS var_reduction
           |FROM v, g
           |ORDER BY variant""".stripMargin
      }) { (s, dir) =>
      val u = events(s, dir)
        .groupBy(col("user_id"),
          pmod(col("user_id"), lit(2L)).as("variant"))
        .agg(
          sum(when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L))
            .as("x"),
          sum(when(dayofmonth(col("ts")) > 15, 1L).otherwise(0L))
            .as("y"))
      val v = u.groupBy(col("variant"))
        .agg(count(lit(1)).as("nv"),
          sum(col("x")).as("sxv"), sum(col("y")).as("syv"),
          sum(col("x") * col("x")).as("sxxv"),
          sum(col("x") * col("y")).as("sxyv"),
          sum(col("y") * col("y")).as("syyv"))
      val g = v.agg(sum(col("nv")).as("n"),
        sum(col("sxv")).as("sx"), sum(col("syv")).as("sy"),
        sum(col("sxxv")).as("sxx"), sum(col("sxyv")).as("sxy"))
      v.crossJoin(broadcast(g))
        .select(col("variant"), col("nv").as("n_users"),
          expr(Cuped.meanY).cast("decimal(18,6)").cast("double")
            .as("mean_y"),
          expr(Cuped.meanYAdj).cast("decimal(18,6)").cast("double")
            .as("mean_y_adj"),
          expr(Cuped.varReduction).cast("decimal(18,6)").cast("double")
            .as("var_reduction"))
        .orderBy(col("variant"))
    },

    QuerySpec.sql(
      "stats_welch_ttest",
      s"""WITH m AS (SELECT
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN event_type = 'click'
         |      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS s1,
         |    CAST(SUM(CASE WHEN event_type = 'view'
         |      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS s2,
         |    CAST(SUM(CASE WHEN event_type = 'click'
         |      THEN CAST(value * value AS DECIMAL(38,6)) END) AS DOUBLE)
         |      AS q1,
         |    CAST(SUM(CASE WHEN event_type = 'view'
         |      THEN CAST(value * value AS DECIMAL(38,6)) END) AS DOUBLE)
         |      AS q2
         |  FROM events WHERE event_type IN ('click', 'view'))
         |SELECT n1, n2, ${Welch.t} AS t_stat, ${Welch.df} AS df
         |FROM m""".stripMargin) { (s, dir) =>
      events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("n2"),
          widedsum(when(col("event_type") === "click", col("value")))
            .as("s1"),
          widedsum(when(col("event_type") === "view", col("value")))
            .as("s2"),
          widedsum(when(col("event_type") === "click",
            col("value") * col("value"))).as("q1"),
          widedsum(when(col("event_type") === "view",
            col("value") * col("value"))).as("q2"))
        .select(col("n1"), col("n2"),
          expr(Welch.t).as("t_stat"), expr(Welch.df).as("df"))
    },

    // Cohort lifetime value: cumulative purchase revenue per signup
    // cohort over week offsets. The running sum is a KEYED window
    // (partitioned by cohort day — bounded rows per key, never a
    // single-task global window), accumulated in exact decimal so
    // the running doubles hash-compare.
    QuerySpec.sql(
      "cohort_ltv",
      """WITH p AS (SELECT user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM p GROUP BY 1),
        |w AS (SELECT f.cohort_day,
        |    CAST((CAST(p.ts AS DATE) - f.cohort_day) // 7 AS BIGINT)
        |      AS week_offset,
        |    SUM(CAST(p.value AS DECIMAL(38,6))) AS rev
        |  FROM p JOIN f USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cohort_day, week_offset,
        |  CAST(SUM(rev) OVER (PARTITION BY cohort_day ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS cum_revenue
        |FROM w ORDER BY cohort_day, week_offset""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val p = events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val f = p.groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      val w = p.join(f, Seq("user_id"))
        .groupBy(col("cohort_day"),
          expr("datediff(CAST(ts AS DATE), cohort_day) div 7")
            .cast("long").as("week_offset"))
        .agg(sum(col("value").cast("decimal(38,6)")).as("rev"))
      w.withColumn("cum_revenue",
          sum(col("rev")).over(Window.partitionBy(col("cohort_day"))
            .orderBy(col("week_offset"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select(col("cohort_day"), col("week_offset"), col("cum_revenue"))
        .orderBy(col("cohort_day"), col("week_offset"))
    },

    // Single changepoint detection on each event type's daily count
    // series: the at-most-one-change CUSUM statistic G_k =
    // |n·S_k − k·T| maximized over split points k, kept in exact
    // integers (S_k from a keyed cumulative window, n/T from the
    // 1-row-per-type totals) — the argmax filter-join needs no float
    // comparison and ties break to the earliest day in both engines.
    QuerySpec.sql(
      "ts_changepoint",
      """WITH d AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, day, c,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS k,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sk
        |  FROM d),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS t FROM d GROUP BY 1),
        |g AS (SELECT r.event_type, r.day,
        |    ABS(st.n * r.sk - r.k * st.t) AS g_num
        |  FROM r JOIN st USING (event_type) WHERE r.k < st.n),
        |mx AS (SELECT event_type, MAX(g_num) AS g_max FROM g GROUP BY 1)
        |SELECT g.event_type, MIN(g.day) AS cp_day,
        |  CAST(mx.g_max AS BIGINT) AS g_num
        |FROM g JOIN mx ON mx.event_type = g.event_type
        |  AND g.g_num = mx.g_max
        |GROUP BY 1, 3 ORDER BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val r = d
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("sk", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      val st = d.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).cast("long").as("t"))
      val g = r.join(st, "event_type").filter(col("k") < col("n"))
        .select(col("event_type"), col("day"),
          abs(col("n") * col("sk") - col("k") * col("t")).as("g_num"))
      val mx = g.groupBy(col("event_type").as("m_type"))
        .agg(max(col("g_num")).as("g_max"))
      g.join(mx, col("m_type") === col("event_type") &&
          col("g_num") === col("g_max"))
        .groupBy(col("event_type"), col("g_max").cast("long").as("g_num"))
        .agg(min(col("day")).as("cp_day"))
        .select(col("event_type"), col("cp_day"), col("g_num"))
        .orderBy(col("event_type"))
    },

    // Peak concurrency per day over the sessionized event stream: the
    // classic interval-overlap maximum, computed WITHOUT interval
    // explosion — per-instant net deltas (+1 session start, −1 after
    // end) fold in a hash aggregate, one global prefix sum orders the
    // instants, and a per-day max reads the running concurrency. At
    // 100 TB the delta table is 2 rows per session and the only global
    // structure is the range-partitioned prefix sum.
    QuerySpec.sql(
      "ts_concurrent_sessions",
      s"""WITH ${graft.operators.TimeSeriesOps.sessionsSql},
         |delta AS (
         |  SELECT us, SUM(d) AS d FROM (
         |    SELECT start_us AS us, 1 AS d FROM sess
         |    UNION ALL SELECT end_us + 1, -1 FROM sess) x
         |  GROUP BY 1),
         |run AS (SELECT us,
         |    CAST(SUM(d) OVER (ORDER BY us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS conc
         |  FROM delta)
         |SELECT CAST(make_timestamp(us) AS DATE) AS day,
         |  CAST(MAX(conc) AS BIGINT) AS peak_concurrency
         |FROM run GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val sess = TimeSeriesOps.sessions(s, dir)
      val delta = sess.select(col("start_us").as("us"), lit(1L).as("d"))
        .unionByName(sess.select((col("end_us") + 1L).as("us"),
          lit(-1L).as("d")))
        .groupBy(col("us")).agg(sum(col("d")).as("d"))
      PrefixSum.globalCumsum(delta, Seq(col("us")), col("d"), "conc")
        .groupBy(to_date(timestamp_micros(col("us"))).as("day"))
        .agg(max(col("conc")).cast("long").as("peak_concurrency"))
        .orderBy(col("day"))
    },

    // Deterministic k-fold assignment (k = 5) for cross-validation:
    // the fold id is the engine-portable md5 hash of the document id,
    // so folds are reproducible on any cluster, any partitioning —
    // with per-fold size/char balance as the audit output.
    QuerySpec.sql(
      "sample_kfold",
      """SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 5 AS fold,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(pmod(graft.functions.Md5Prefix.md5_prefix_long(
          col("doc_id").cast("string")), lit(5L)).as("fold"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("fold"))
    },

    // GROUP k-fold (k = 3) — the leakage-safe split sample_kfold is
    // not: when near-duplicate documents cluster inside a SOURCE,
    // doc-level folds leak train data into validation; group k-fold
    // assigns the whole source to one fold (fold = md5(source) — the
    // standard sklearn GroupKFold contract, hash-deterministic here).
    // The audit output is per fold: sources, docs, token mass, and
    // the en-share (class balance) — the skew a grouped split trades
    // for leak-freedom, made visible in exact ppm.
    QuerySpec.sql(
      "sample_group_kfold",
      """SELECT CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 3
        |    AS fold,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS en_ppm
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(pmod(graft.functions.Md5Prefix.md5_prefix_long(
          col("source")), lit(3L)).as("fold"))
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long"))
            .as("n_tokens"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ne"))
        .select(col("fold"), col("n_sources"), col("n_docs"),
          col("n_tokens"),
          expr("CAST(ne * 1000000 div n_docs AS BIGINT)").as("en_ppm"))
        .orderBy(col("fold"))
    },

    // Class-balanced sampling: exactly k = 40 vectors per label, the
    // per-class budget every classifier-training pipeline draws.
    // Selection order is the portable md5 hash of the id (uniform,
    // reproducible on any partitioning); the per-label top-k runs the
    // custom TopKPerKey plan — map-side heap pruning, k·partitions
    // shuffle rows — never a per-label sort of the whole class.
    QuerySpec.sql(
      "sample_class_balanced",
      """WITH h AS (SELECT label, vec_id,
        |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS hv
        |  FROM embeddings),
        |r AS (SELECT label, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY hv, vec_id)
        |      AS rn
        |  FROM h)
        |SELECT label, vec_id FROM r WHERE rn <= 40
        |ORDER BY label, vec_id""".stripMargin) { (s, dir) =>
      val h = t(s, dir, "embeddings")
        .select(col("label"), col("vec_id"),
          graft.functions.Md5Prefix.md5_prefix_long(
            col("vec_id").cast("string")).as("hv"))
      graft.plans.TopKPerKey.topK(h, Seq("label"),
          Seq("hv" -> false, "vec_id" -> false), 40)
        .select(col("label"), col("vec_id"))
        .orderBy(col("label"), col("vec_id"))
    },

    // Neyman allocation: the variance-proportional stratified sampling
    // design (quota_h ∝ N_h·σ_h) for a 1000-row budget over the event
    // types — the survey-sampling step BEFORE drawing (pairs with the
    // hash-threshold samplers). All double folds that would be
    // order-dependent (the Σ N·σ normalizer) run as ordered LEFT FOLDS
    // over a type-sorted list in BOTH engines; floor quotas are exact,
    // and the largest-remainder top-up ranks by a window-free
    // count-greater self-join over the 5-row stratum table.
    QuerySpec.sql(
      "sample_neyman",
      """WITH m AS (SELECT event_type AS g,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS q
        |  FROM events GROUP BY 1),
        |w AS (SELECT g, n,
        |    CAST(n AS DOUBLE) * sqrt((q - s * s / CAST(n AS DOUBLE))
        |      / CAST(n - 1 AS DOUBLE)) AS nw
        |  FROM m WHERE n > 1),
        |tot AS (SELECT list_sum(list(nw ORDER BY g)) AS wt FROM w),
        |fl AS (SELECT g, n, nw, 1000 * nw / wt AS ideal,
        |    CAST(FLOOR(1000 * nw / wt) AS BIGINT) AS fq
        |  FROM w, tot),
        |rem AS (SELECT CAST(1000 - SUM(fq) AS BIGINT) AS r FROM fl),
        |rk AS (SELECT a.g, CAST(COUNT(b.g) AS BIGINT) AS ahead
        |  FROM fl a LEFT JOIN fl b
        |    ON (b.ideal - b.fq) > (a.ideal - a.fq)
        |    OR ((b.ideal - b.fq) = (a.ideal - a.fq) AND b.g < a.g)
        |  GROUP BY 1)
        |SELECT fl.g AS event_type, fl.n, fl.nw AS n_sigma,
        |  fl.fq + CASE WHEN rk.ahead < rem.r THEN 1 ELSE 0 END
        |    AS quota
        |FROM fl JOIN rk ON rk.g = fl.g, rem
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val m = events(s, dir).groupBy(col("event_type").as("g"))
        .agg(count(lit(1)).as("n"), widedsum(col("value")).as("s"),
          widedsum(col("value") * col("value")).as("q"))
        .filter(col("n") > 1)
      val w = m.select(col("g"), col("n"),
        (col("n").cast("double") *
          sqrt((col("q") - col("s") * col("s") / col("n").cast("double")) /
            (col("n") - lit(1)).cast("double"))).as("nw"))
      val tot = w.agg(expr(
        "aggregate(array_sort(collect_list(struct(g, nw)))," +
          " CAST(0 AS DOUBLE), (acc, x) -> acc + x.nw)").as("wt"))
      val fl = w.crossJoin(broadcast(tot))
        .withColumn("ideal", lit(1000) * col("nw") / col("wt"))
        .withColumn("fq", floor(col("ideal")).cast("long"))
      val rem = fl.agg((lit(1000) - sum(col("fq"))).cast("long").as("r"))
      val b = fl.select(col("g").as("bg"), (col("ideal") - col("fq")).as("bf"))
      val rk = fl.select(col("g"), (col("ideal") - col("fq")).as("af"))
        .join(b, col("bf") > col("af") ||
          (col("bf") === col("af") && col("bg") < col("g")), "left")
        .groupBy(col("g")).agg(count(col("bg")).as("ahead"))
      fl.join(rk, Seq("g")).crossJoin(broadcast(rem))
        .select(col("g").as("event_type"), col("n"), col("nw").as("n_sigma"),
          (col("fq") + when(col("ahead") < col("r"), 1L).otherwise(0L))
            .as("quota"))
        .orderBy(col("event_type"))
    },

    // Hashing trick: document tokens folded into 64 hash buckets (the
    // fixed-width feature space) with per-bucket token and document
    // frequencies. The bucket id is the same engine-portable
    // md5→hex→int hash, so the oracle builds the identical table; the
    // whole feature map is two codegen'd hash aggregates.
    QuerySpec.sql(
      "feat_hashing_trick",
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_extract_all(lower(text), '[a-z]+', 0),
        |    t -> length(t) >= 2)) AS tk
        |  FROM documents),
        |b AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT) % 64 AS bucket
        |  FROM tok)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(expr(
          "filter(regexp_extract_all(lower(text), '[a-z]+', 0)," +
            " t -> length(t) >= 2)")).as("tk"))
        .select(col("doc_id"),
          pmod(graft.functions.Md5Prefix.md5_prefix_long(col("tk")),
            lit(64L)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("bucket"))
    },

    // Pairwise Pearson correlation matrix over the four lineitem
    // numeric features — the first feature-selection screen (drop one
    // of any near-collinear pair before it poisons a linear model).
    // ONE pass collects every sufficient statistic (4 sums, 4 squared
    // sums, 6 cross sums) as exact BIGINTs over a unit/percent
    // quantization chosen so every statistic stays inside int64 —
    // int64→double conversion is correctly rounded in BOTH engines,
    // where a 128-bit-integer→double cast is not (measured: ulp-level
    // divergence at sf0.1 with cents quantization). Each r is the
    // shared closed-form float over those exact integers (the
    // assortativity discipline), 6 literal-labeled rows. ANSI-loud
    // envelope: Σe² < 9.2e18 holds to ~10⁸ lineitem rows; beyond
    // that, coarsen the price quantization another decade.
    QuerySpec.sql(
      "feat_corr_matrix", {
        def r(a: String, b: String) =
          s"(CAST(n AS DOUBLE) * CAST(s$a$b AS DOUBLE)" +
            s" - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE))" +
            s" / sqrt((CAST(n AS DOUBLE) * CAST(s$a$a AS DOUBLE)" +
            s" - CAST(s$a AS DOUBLE) * CAST(s$a AS DOUBLE))" +
            s" * (CAST(n AS DOUBLE) * CAST(s$b$b AS DOUBLE)" +
            s" - CAST(s$b AS DOUBLE) * CAST(s$b AS DOUBLE)))"
        val pairs = Seq("q" -> "e", "q" -> "d", "q" -> "x",
          "e" -> "d", "e" -> "x", "d" -> "x")
        val names = Map("q" -> "quantity", "e" -> "extendedprice",
          "d" -> "discount", "x" -> "tax")
        s"""WITH v AS (
           |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
           |    CAST(round(l_extendedprice) AS BIGINT) AS e,
           |    CAST(round(l_discount * 100) AS BIGINT) AS d,
           |    CAST(round(l_tax * 100) AS BIGINT) AS x
           |  FROM lineitem),
           |s AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |${Seq("q", "e", "d", "x").map(c =>
              s"    CAST(SUM($c) AS BIGINT) AS s$c," +
                s" CAST(SUM($c * $c) AS BIGINT)" +
                s" AS s$c$c,").mkString("\n")}
           |${pairs.map { case (a, b) =>
              s"    CAST(SUM($a * $b) AS BIGINT)" +
                s" AS s$a$b," }.mkString("\n").dropRight(1)}
           |  FROM v)
           |${pairs.map { case (a, b) =>
              s"SELECT '${names(a)}' AS x_col, '${names(b)}' AS y_col," +
                s" n, ${r(a, b)} AS r FROM s" }
              .mkString("\nUNION ALL\n")}
           |ORDER BY x_col, y_col""".stripMargin
      }) { (s, dir) =>
      def rr(a: String, b: String) =
        s"(CAST(n AS DOUBLE) * CAST(s$a$b AS DOUBLE)" +
          s" - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE))" +
          s" / sqrt((CAST(n AS DOUBLE) * CAST(s$a$a AS DOUBLE)" +
          s" - CAST(s$a AS DOUBLE) * CAST(s$a AS DOUBLE))" +
          s" * (CAST(n AS DOUBLE) * CAST(s$b$b AS DOUBLE)" +
          s" - CAST(s$b AS DOUBLE) * CAST(s$b AS DOUBLE)))"
      val pairs = Seq("q" -> "e", "q" -> "d", "q" -> "x",
        "e" -> "d", "e" -> "x", "d" -> "x")
      val names = Map("q" -> "quantity", "e" -> "extendedprice",
        "d" -> "discount", "x" -> "tax")
      val v = t(s, dir, "lineitem").select(
        expr("CAST(round(l_quantity) AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice) AS BIGINT)").as("e"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"),
        expr("CAST(round(l_tax * 100) AS BIGINT)").as("x"))
      val aggs =
        Seq("q", "e", "d", "x").flatMap(c => Seq(
          sum(col(c)).cast("long").as(s"s$c"),
          sum(col(c) * col(c)).cast("long").as(s"s$c$c"))) ++
        pairs.map { case (a, b) =>
          sum(col(a) * col(b)).cast("long").as(s"s$a$b") }
      val st = v.agg(count(lit(1)).as("n"), aggs: _*)
      pairs.map { case (a, b) =>
        st.select(lit(names(a)).as("x_col"), lit(names(b)).as("y_col"),
          col("n"), expr(rr(a, b)).as("r"))
      }.reduce(_ unionByName _)
        .orderBy(col("x_col"), col("y_col"))
    })
}
