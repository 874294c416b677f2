package graft.operators

import graft.QuerySpec
import graft.functions.Materialize
import graft.functions.DotProductLong.dot_long
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed clustering + graph analytics over the embedding space —
  * the curation stages that consume the similarity machinery: k-means
  * partitions a corpus into semantic groups (diversity sampling, IVF
  * training, per-cluster quotas); PageRank over the k-NN graph scores
  * centrality (representative selection, graph-weighted sampling).
  *
  * Cross-engine determinism (same discipline as [[SimilarityOps]]):
  * every iterative step is exact integer math or a single
  * correctly-rounded IEEE double op, so Spark and DuckDB produce
  * identical bits at any parallelism:
  *   - k-means distances are integer expansions
  *     ‖a‖² − 2⟨a,c⟩ + ‖c‖² over micro-unit quantized vectors;
  *     centroid updates floor the exact rational mean (sums < 2^53,
  *     so the double division is exact-input correctly-rounded on
  *     both engines); ties broken by centroid id.
  *   - PageRank holds ranks as integer mass (RankScale = 1e12):
  *     per-edge contribution = floor(rank / outdeg), damping =
  *     floor(0.85 · Σ) — one correctly-rounded multiply per node per
  *     round. No float accumulation anywhere, so aggregation order
  *     (and therefore partitioning) cannot change the answer.
  *
  * Scale shape: both loops are fixed-iteration shuffle-on-key
  * fixpoints of the [[graft.functions.ConnectedComponents]] family —
  * per-round lineage truncation ([[Materialize.stable]]: reliable
  * checkpoint when a dir is set, executor-local otherwise), no
  * driver-side data movement (centroids stay a K-row DataFrame that
  * Spark auto-broadcasts; ranks shuffle on vec_id). The k-NN edge
  * list is built once by [[SimilarityOps.knnEdges]] (triangle-blocked
  * pair generation) and reused across all 5 PageRank rounds.
  */
object ClusterOps {

  /** Cluster count. Tiny relative to the corpus — the centroid table
    * is always broadcast-sized (K rows), the corpus side never
    * re-shuffles during assignment.
    */
  val K = 4

  /** Fixed Lloyd iterations (assignments), so the computation is
    * expressible as a finite SQL plan on both engines. */
  val KmeansIters = 3

  /** Fixed power-iteration rounds for PageRank. */
  val PageRankIters = 5

  /** Integer rank mass per node at initialization (1e12: six decimal
    * digits of rank precision after five damped rounds). Exactness
    * bound: a rank cast to double stays exact only while it is below
    * 2^53 ≈ 9.0e15, i.e. up to ~9e3 nodes' worth of mass concentrated
    * on ONE node (n·1e12 < 2^53 ⇒ n ≲ 9 007). Beyond that the damping
    * multiply's long→double conversion rounds, so cross-engine
    * determinism no longer rests on exactness but on both engines
    * applying the same correctly-rounded IEEE conversion and multiply
    * to the same exact integer Σ (the per-edge sums themselves stay
    * pure long arithmetic, order-independent at any size). */
  val RankScale = 1000000000000L

  /** floor(0.15 · RankScale) — the teleport mass added each round. */
  val TeleportMass: Long = RankScale / 100L * 15L

  /** Assignment step: nearest centroid by squared L2 distance, ties
    * to the smallest centroid id. One broadcast join (K rows) + one
    * map-side-combinable hash aggregate — the corpus never shuffles.
    */
  private def assignStep(sig: DataFrame, cent: DataFrame): DataFrame =
    sig.select(col("vec_id"), col("qv"), col("norm2"))
      .crossJoin(broadcast(cent))
      .withColumn("dist2",
        col("norm2") - lit(2L) * dot_long(col("qv"), col("cv")) + col("cnorm2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist2").as("dist2"))

  /** Centroid update: per-dimension floor-mean of the assigned
    * vectors. posexplode → hash aggregate on (cid, dim) — K·64 groups,
    * map-side combinable — then one K-row re-assembly (array_sort on
    * the dim index makes collect_list order-independent).
    */
  private def updateStep(sig: DataFrame, assigned: DataFrame): DataFrame =
    assigned.select(col("vec_id"), col("cid"))
      .join(sig.select(col("vec_id"), posexplode(col("qv")).as(Seq("pos0", "x"))),
        Seq("vec_id"))
      .groupBy(col("cid"), col("pos0"))
      .agg(floor(sum(col("x")) / count(lit(1))).cast("long").as("v"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos0, v))), p -> p.v)")
        .as("cv"))
      .withColumn("cnorm2", dot_long(col("cv"), col("cv")))

  /** Deterministic init: the K smallest vec_ids' vectors, cid = rank
    * among them. The rank is assigned on the DRIVER over the K
    * collected rows (K is a constant; this is the same
    * bounded-by-construction driver step as PrefixSum's offsets) —
    * not via a global window, which would emit the unpartitioned-
    * WindowExec plan even though only K rows ever reach it.
    */
  private def initCentroids(sig: DataFrame): DataFrame = {
    val s = sig.sparkSession
    val rows = sig.orderBy(col("vec_id")).limit(K)
      .select(col("vec_id"), col("qv"), col("norm2"))
      .collect()
    val data = rows.sortBy(_.getLong(0)).zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(i.toLong, r.getSeq[Long](1), r.getLong(2))
    }.toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("cnorm2",
        org.apache.spark.sql.types.LongType)))
    s.createDataFrame(s.sparkContext.parallelize(data, 1), schema)
  }

  /** Final assignment after KmeansIters Lloyd rounds:
    * (vec_id, cid, dist2). The CONVERGED CENTROIDS are memoized per
    * (session, dir) like [[DedupOps]]' cluster labels: the Lloyd
    * fixpoint's materialized rounds defeat Spark's plan-equality
    * cache, and two gates (cluster_kmeans, dedup_semantic) consume
    * the same assignment — at warehouse scale the centroid table is
    * the write-once model artifact both read. Only the centroids are
    * memoized, not the assignment itself: the final assign step stays
    * a lazy broadcast-join plan (K-row build side) each consumer
    * composes into its own tree.
    */
  private val kmMemo = new graft.functions.DataFrameMemo

  /** Release memoized centroids — all entries of `session`, or every
    * entry when called with None (the [[DedupOps.clearClusterLabels]]
    * lifecycle hook, for services recycling sessions over many dirs;
    * the gate harness runs one session and never needs it). Cached
    * blocks are unpersisted; checkpoint files follow the
    * [[graft.functions.Materialize]] retention contract.
    */
  def clearKmeansCentroids(session: Option[SparkSession] = None): Unit =
    kmMemo.clear(session)

  /** The converged centroid table (cid, cv, cnorm2) — the memoized
    * model artifact; see [[kmMemo]]. */
  private[operators] def kmeansCentroids(s: SparkSession,
      dir: String): DataFrame = {
    val sig = SimilarityOps.signatures(s, dir)
    kmMemo.getOrBuild(s, dir) {
      var c = Materialize.stable(initCentroids(sig))
      for (_ <- 1 until KmeansIters) {
        val a = assignStep(sig, c)
        c = Materialize.stable(updateStep(sig, a))
      }
      c
    }
  }

  def kmeansAssignments(s: SparkSession, dir: String): DataFrame = {
    val sig = SimilarityOps.signatures(s, dir)
    assignStep(sig, kmeansCentroids(s, dir)).orderBy(col("vec_id"))
  }

  /** Squared cosine threshold for semantic dedup, as the exact
    * rational τ² = SemDupNum/SemDupDen (τ = 0.3 — the same
    * neighborhood the embedding near-dup gate mines). Comparing
    * `SemDupDen·dot² ≥ SemDupNum·‖a‖²·‖b‖²` keeps the entire decision
    * in integer arithmetic: no sqrt, no double division, identical
    * bits on any engine. The products reach ~4e29 (dot ≤ 6.4e13 for
    * 64-dim micro-quantized vectors), so they are formed in
    * DECIMAL(38,0) on Spark and HUGEINT in the oracle — both exact.
    */
  val SemDupNum = 9L
  val SemDupDen = 100L

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): prune
    * documents whose EMBEDDINGS nearly coincide, even when their text
    * differs (translations, templated rewrites, boilerplate variants
    * that survive lexical MinHash). Pipeline: k-means partitions the
    * corpus into semantic clusters ([[kmeansAssignments]], fixed
    * deterministic rounds), candidate pairs are generated only WITHIN
    * a cluster, and a document is dropped in favor of its
    * smallest-vec_id neighbor with cos ≥ τ (greedy keep-first — one
    * representative per similarity neighborhood, no transitive
    * chaining through dissimilar middles).
    *
    * Scale shape: the cluster id is the shuffle key — the all-pairs
    * surface is Σ cluster² instead of corpus², and each cluster's
    * pair work is further split into bounded [[graft.functions.Pairs]]
    * triangle blocks (worst task = blockSize² pairs, hub-safe). This
    * is exactly the SemDeDup recipe: k-means IS the blocking
    * structure, so pair cost is controlled by K, which scales with
    * the corpus. Output: (vec_id, cid, dup_of, keep).
    */
  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    val asg = kmeansAssignments(s, dir).select(col("vec_id"), col("cid"))
    val sig = SimilarityOps.signatures(s, dir)
      .select(col("vec_id"), col("qv"), col("norm2"))
    val m = sig.join(asg, Seq("vec_id"))
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val dup = graft.functions.Pairs.blockedSelfPairs(m,
        keyCols = Seq("cid"), idCol = "vec_id",
        payload = Seq("qv", "norm2"), blockSize = SimilarityOps.PairBlockSize)
      .withColumn("dot", dot_long(col("a_qv"), col("b_qv")))
      .filter(col("dot") > 0 &&
        lit(SemDupDen).cast(d19) * col("dot").cast(d19) * col("dot").cast(d19) >=
          lit(SemDupNum).cast(d19) * col("a_norm2").cast(d19) *
            col("b_norm2").cast(d19))
      .groupBy(col("b_vec_id").as("vec_id"))
      .agg(min(col("a_vec_id")).as("dup_of"))
    m.select(col("vec_id"), col("cid"))
      .join(dup, Seq("vec_id"), "left")
      .withColumn("keep", col("dup_of").isNull)
      .orderBy(col("vec_id"))
  }

  private def semanticDedupOracle: String = {
    val dot = "CAST(list_dot_product(a.qv, b.qv) AS BIGINT)"
    (kmeansCtes ++ Seq(
      s"""m AS (SELECT s.vec_id, s.qv, s.norm2, k.cid
         |  FROM sig s JOIN a$KmeansIters k ON k.vec_id = s.vec_id)""".stripMargin,
      s"""dup AS (
         |  SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS dup_of
         |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE $dot > 0
         |    AND $SemDupDen * CAST($dot AS HUGEINT) * CAST($dot AS HUGEINT)
         |      >= $SemDupNum * CAST(a.norm2 AS HUGEINT) * CAST(b.norm2 AS HUGEINT)
         |  GROUP BY b.vec_id)""".stripMargin))
      .mkString("WITH ", ",\n", "") +
      s"""
         |SELECT m.vec_id, m.cid, d.dup_of, d.dup_of IS NULL AS keep
         |FROM m LEFT JOIN dup d ON d.vec_id = m.vec_id
         |ORDER BY m.vec_id""".stripMargin
  }

  /** PageRank over the directed k-NN graph: 5 damped power-iteration
    * rounds in integer mass. Per round: one shuffle-on-key join
    * (edges ⨝ ranks), one hash aggregate, one left join back to the
    * node set (isolated nodes hold the teleport mass). Dangling mass
    * is dropped (not redistributed) — the conventional simplification,
    * mirrored exactly by the oracle.
    */
  def pagerank(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val sig = SimilarityOps.signatures(s, dir)
    val edges = Materialize.stable(
      SimilarityOps.knnEdges(s, dir, k).select(col("vec_id"), col("nbr_id")))
    val outdeg = edges.groupBy(col("vec_id")).agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(outdeg, Seq("vec_id"))
    val nodes = sig.select(col("vec_id"))
    var ranks = nodes.withColumn("rank", lit(RankScale))
    for (_ <- 1 to PageRankIters) {
      val contrib = withDeg.join(ranks, Seq("vec_id"))
        .select(col("nbr_id").as("vec_id"),
          floor(col("rank").cast("double") / col("outdeg")).cast("long").as("c"))
      val summed = contrib.groupBy(col("vec_id")).agg(sum(col("c")).as("sc"))
      // rounds CHAIN in one Catalyst tree (r16): with a FIXED small
      // iteration count the per-round eager localCheckpoint bought
      // nothing — the lineage grows linearly, and the 5 checkpoint
      // jobs (write + re-read per round) cost more than planning the
      // 5-deep ladder once. The edge list stays stable'd above (it is
      // the one row-scale input every round re-reads).
      ranks = nodes.join(summed, Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(TeleportMass) +
            floor(lit(0.85) * coalesce(col("sc"), lit(0L)).cast("double"))
              .cast("long")).as("rank"))
    }
    ranks.orderBy(col("rank").desc, col("vec_id"))
  }

  /** Per-node triangle counts over the undirected k-NN graph — the
    * local-clustering signal (a node whose neighbors interlink sits in
    * a dense semantic pocket; one with zero triangles is a hub between
    * unrelated regions).
    *
    * Scale shape: the classic degree-ordered enumeration. Each
    * undirected edge is oriented from its lower-(degree, id) endpoint
    * to the higher, so every triangle is generated exactly once from
    * the wedge at its minimum-order vertex; a pivot's out-degree is
    * bounded by O(√m) on any graph (and by 2k here), so the wedge
    * self-join on the pivot key never explodes on a high-degree hub —
    * the naive id-ordered join (which the DuckDB oracle keeps; the
    * result is algorithm-independent) would put a celebrity node's
    * full neighborhood² into one task. Cost: two hash aggregates
    * (degrees, counts) + two shuffle joins (wedge, closing edge).
    */
  def triangleCounts(s: SparkSession, dir: String): DataFrame = {
    val nodes = SimilarityOps.signatures(s, dir).select(col("vec_id"))
    triangleCountsOf(nodes, undirectedEdges(s, dir))
  }

  /** Deduplicated undirected k-NN edge list (u < v), memoized per
    * (session, dir): triangle counting and link prediction both read
    * it, and the Materialize.stable truncation defeats the
    * plan-equality cache — at warehouse scale this is the write-once
    * `und_edges` table beside the directed `knn_edges`.
    */
  private val undMemo = new graft.functions.DataFrameMemo
  private def undirectedEdges(s: SparkSession, dir: String): DataFrame =
    undMemo.getOrBuild(s, dir)(Materialize.stable(
      SimilarityOps.knnEdges(s, dir, 3)
        .select(least(col("vec_id"), col("nbr_id")).as("u"),
          greatest(col("vec_id"), col("nbr_id")).as("v"))
        .distinct()))

  /** Release memoized undirected edges (lifecycle hook, see
    * [[clearKmeansCentroids]]). */
  def clearUndirectedEdges(session: Option[SparkSession] = None): Unit =
    undMemo.clear(session)

  /** Core of [[triangleCounts]] over an explicit node set and a
    * deduplicated undirected edge list (u < v, u and v ∈ nodes).
    */
  private[graft] def triangleCountsOf(nodes: DataFrame,
      und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("n"))
      .unionByName(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient low-(degree, id) → high; carry the head's order key so
    // the wedge join can demand o(b) < o(c) without a re-join
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(
            struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    val x = oriented.select(col("s"), col("t").as("b"), col("dt").as("db"))
    val y = oriented.select(col("s"), col("t").as("c"), col("dt").as("dc"))
    val wedges = x.join(y, Seq("s"))
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val tris = wedges.join(
      oriented.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
      .select(col("s").as("a"), col("b"), col("c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_triangles"))
    nodes.join(perNode, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy(col("vec_id"))
  }

  /** Number of greedy k-center rounds (= selected coreset size). */
  val KCenterCount = 5

  /** Greedy k-center coreset selection (Gonzalez 1985): seed with the
    * smallest vec_id, then repeatedly select the point FARTHEST from
    * the already-selected set (max over the corpus of the min squared
    * L2 distance to any selected center, ties to the smallest vec_id).
    * The classic 2-approximation to the k-center objective and the
    * standard diversity-maximizing data-selection primitive: the
    * selected rows cover the embedding space — every corpus point is
    * within the final covering radius of some selected point.
    *
    * Output: one row per selected center, (sel_rank, vec_id,
    * cover_dist2) where cover_dist2 is the min-distance that made the
    * point the farthest at its selection round (0 for the seed) — a
    * non-increasing sequence; the last value upper-bounds twice the
    * optimal k-center radius.
    *
    * Scale shape: the greedy is inherently k sequential passes, but
    * each pass is embarrassingly parallel — the selected set (≤ K
    * rows) broadcasts, min-distance is a per-row fold, and the argmax
    * is TakeOrdered(1), so per-pass driver traffic is ONE row. Same
    * exact-integer distance discipline as k-means: micro-quantized
    * long vectors, dist² = ‖x‖² − 2⟨x,c⟩ + ‖c‖² in pure long
    * arithmetic, bit-identical on any engine and any partitioning.
    * For K in the thousands, the sequential-pass count is the
    * bottleneck and the over-sampling relaxation (k-means‖-style:
    * sample Θ(k) farthest candidates per pass, then reduce) trades
    * exactness for O(log n) passes — this operator is the exact
    * small-K primitive those variants approximate.
    */
  def kcenterSelect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val sig = SimilarityOps.signatures(s, dir)
      .select(col("vec_id"), col("qv"), col("norm2"))
    val seed = sig.orderBy(col("vec_id")).limit(1).collect()(0)
    val selected = scala.collection.mutable.ArrayBuffer(
      (0, seed.getLong(0), seed.getSeq[Long](1), seed.getLong(2), 0L))
    val centSchema = StructType(Seq(
      StructField("cqv", ArrayType(LongType)),
      StructField("cnorm2", LongType)))
    for (r <- 1 until KCenterCount) {
      val cent = s.createDataFrame(
        s.sparkContext.parallelize(
          selected.map(t => Row(t._3, t._4)).toSeq, 1), centSchema)
      val top = sig.crossJoin(broadcast(cent))
        .select(col("vec_id"),
          (col("norm2") - lit(2L) * dot_long(col("qv"), col("cqv"))
            + col("cnorm2")).as("d"))
        .groupBy(col("vec_id")).agg(min(col("d")).as("md"))
        .orderBy(col("md").desc, col("vec_id").asc)
        .limit(1).collect()(0)
      val next = sig.filter(col("vec_id") === top.getLong(0)).collect()(0)
      selected += ((r, next.getLong(0), next.getSeq[Long](1),
        next.getLong(2), top.getLong(1)))
    }
    val outSchema = StructType(Seq(
      StructField("sel_rank", IntegerType),
      StructField("vec_id", LongType),
      StructField("cover_dist2", LongType)))
    s.createDataFrame(
      s.sparkContext.parallelize(
        selected.map(t => Row(t._1, t._2, t._5)).toSeq, 1), outSchema)
      .orderBy(col("sel_rank"))
  }

  // ---- oracle SQL (generated to mirror the fixed iteration count) ----

  private def kcenterOracle: String = {
    val dist = "s.norm2 - 2 * CAST(list_dot_product(s.qv, c.qv) AS BIGINT)" +
      " + c.norm2"
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"sig AS (SELECT vec_id, qv, CAST(norm2 AS BIGINT) AS norm2 " +
        s"FROM (${SimilarityOps.quantizedSql}) q0)",
      s"""sel1 AS (
         |  SELECT vec_id, qv, norm2, 0 AS sel_rank,
         |    CAST(0 AS BIGINT) AS cd
         |  FROM (SELECT * FROM sig ORDER BY vec_id LIMIT 1) t)""".stripMargin)
    for (i <- 2 to KCenterCount) {
      ctes += s"""m${i - 1} AS (
         |  SELECT s.vec_id, MIN($dist) AS md
         |  FROM sig s CROSS JOIN sel${i - 1} c GROUP BY s.vec_id)""".stripMargin
      ctes += s"""p$i AS (
         |  SELECT vec_id, md FROM m${i - 1}
         |  ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
      ctes += s"""sel$i AS (
         |  SELECT * FROM sel${i - 1}
         |  UNION ALL
         |  SELECT s.vec_id, s.qv, s.norm2, ${i - 1} AS sel_rank, p.md AS cd
         |  FROM sig s JOIN p$i p ON p.vec_id = s.vec_id)""".stripMargin
    }
    ctes.mkString("WITH ", ",\n", "") +
      s"""
         |SELECT sel_rank, vec_id, cd AS cover_dist2 FROM sel$KCenterCount
         |ORDER BY sel_rank""".stripMargin
  }

  /** CTE chain ending in `a$KmeansIters` = (vec_id, cid, dist2). */
  private def kmeansCtes: Seq[String] = {
    val init =
      s"""SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv,
         |  norm2 AS cnorm2
         |FROM (SELECT * FROM sig ORDER BY vec_id LIMIT $K) t""".stripMargin
    def assign(c: String) =
      s"""SELECT vec_id, cid, dist2 FROM (
         |  SELECT s.vec_id, c.cid,
         |    s.norm2 - 2 * CAST(list_dot_product(s.qv, c.cv) AS BIGINT)
         |      + c.cnorm2 AS dist2,
         |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
         |      ORDER BY s.norm2 - 2 * CAST(list_dot_product(s.qv, c.cv) AS BIGINT)
         |        + c.cnorm2, c.cid) AS rnk
         |  FROM sig s CROSS JOIN $c c) t
         |WHERE rnk = 1""".stripMargin
    def update(a: String) =
      s"""SELECT cid, list(v ORDER BY pos) AS cv,
         |  CAST(list_dot_product(list(v ORDER BY pos), list(v ORDER BY pos))
         |    AS BIGINT) AS cnorm2
         |FROM (
         |  SELECT a.cid, pos,
         |    CAST(FLOOR(SUM(s.qv[pos]) / COUNT(*)) AS BIGINT) AS v
         |  FROM $a a, sig s,
         |    UNNEST(generate_series(1, len(s.qv))) AS u(pos)
         |  WHERE s.vec_id = a.vec_id
         |  GROUP BY a.cid, pos) d
         |GROUP BY cid""".stripMargin
    val quantSig = s"sig AS (SELECT vec_id, qv, CAST(norm2 AS BIGINT) AS norm2 " +
      s"FROM (${SimilarityOps.quantizedSql}) q0)"
    val ctes = scala.collection.mutable.ArrayBuffer(quantSig, s"c0 AS ($init)")
    for (i <- 1 to KmeansIters) {
      ctes += s"a$i AS (${assign(s"c${i - 1}")})"
      if (i < KmeansIters) ctes += s"c$i AS (${update(s"a$i")})"
    }
    ctes.toSeq
  }

  /** The full k-means oracle query (assignment after the fixed Lloyd
    * rounds); [[kmeansCtes]] is shared with the semantic-dedup oracle,
    * which consumes the same assignment.
    */
  private def kmeansOracle: String =
    kmeansCtes.mkString("WITH ", ",\n", "") +
      s"\nSELECT vec_id, cid, dist2 FROM a$KmeansIters ORDER BY vec_id"

  private def pagerankOracle: String = {
    def step(prev: String) =
      s"""SELECT n.vec_id,
         |  CAST($TeleportMass AS BIGINT) + CAST(FLOOR(CAST(0.85 AS DOUBLE)
         |    * CAST(COALESCE(SUM(
         |        CAST(FLOOR(CAST(r.rank AS DOUBLE) / o.outdeg) AS BIGINT)
         |      ), 0) AS DOUBLE)) AS BIGINT) AS rank
         |FROM (SELECT vec_id FROM sig) n
         |LEFT JOIN knn e ON e.nbr_id = n.vec_id
         |LEFT JOIN $prev r ON r.vec_id = e.vec_id
         |LEFT JOIN deg o ON o.vec_id = e.vec_id
         |GROUP BY n.vec_id""".stripMargin
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"sig AS (${SimilarityOps.quantizedSql})",
      s"knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k)",
      "deg AS (SELECT vec_id, COUNT(*) AS outdeg FROM knn GROUP BY vec_id)",
      s"r0 AS (SELECT vec_id, CAST($RankScale AS BIGINT) AS rank FROM sig)")
    for (i <- 1 to PageRankIters) ctes += s"r$i AS (${step(s"r${i - 1}")})"
    ctes.mkString("WITH ", ",\n", "") +
      s"\nSELECT vec_id, rank FROM r$PageRankIters ORDER BY rank DESC, vec_id"
  }

  def specs: Seq[QuerySpec] = Seq(
    // Greedy k-center coreset selection over the quantized embeddings
    // (see [[kcenterSelect]]); the oracle unrolls the fixed selection
    // rounds into a CTE chain, like the Lloyd/PageRank oracles.
    QuerySpec.sql("select_kcenter", kcenterOracle) { (s, dir) =>
      kcenterSelect(s, dir)
    },

    // Deterministic Lloyd k-means over the quantized embeddings:
    // 3 fixed rounds, init = K smallest vec_ids, integer distances,
    // floor-mean centroids. Output: final assignment + distance.
    QuerySpec.sql("cluster_kmeans", kmeansOracle) { (s, dir) =>
      kmeansAssignments(s, dir)
    },

    // Semantic (embedding-space) dedup: k-means clusters as the
    // blocking structure, within-cluster cosine ≥ τ decided in exact
    // integer arithmetic, keep = smallest vec_id per neighborhood.
    QuerySpec.sql("dedup_semantic", semanticDedupOracle) { (s, dir) =>
      semanticDedup(s, dir)
    },

    // Clustering-quality diagnostic: the simplified (centroid-based)
    // silhouette of the k-means model, on SQUARED distances so every
    // operand stays an exact long — a = the point's distance² to its
    // own (nearest) centroid, b = distance² to the second-nearest;
    // s = (b−a)/max(a,b) per point, rounded to integer micros (the
    // LM-gate trick) so the per-cluster mean is a division of two
    // exact integers and hash-compares. The number a curation
    // pipeline reads before trusting cluster-blocked dedup (a cluster
    // with mean s near 0 is bleeding near-dups across the block
    // boundary).
    //
    // Scale shape: ONE broadcast join of the K-row centroid table
    // against the corpus; a and b are the two smallest of each
    // point's K distances, taken from a K-bounded sorted collect in
    // the same aggregate that the assign step would run — no second
    // pass, no corpus-sized shuffle join. Tie-breaking matches the
    // assignment exactly (min (d2, cid) struct order).
    QuerySpec.sql(
      "cluster_silhouette",
      kmeansCtes.mkString("WITH ", ",\n", ",\n") +
        s"""alldist AS (
           |  SELECT s.vec_id, c.cid,
           |    s.norm2 - 2 * CAST(list_dot_product(s.qv, c.cv) AS BIGINT)
           |      + c.cnorm2 AS d2
           |  FROM sig s CROSS JOIN c${KmeansIters - 1} c),
           |pt AS (
           |  SELECT vec_id,
           |    MAX(CASE WHEN rn = 1 THEN cid END) AS cid,
           |    MAX(CASE WHEN rn = 1 THEN d2 END) AS a2,
           |    MAX(CASE WHEN rn = 2 THEN d2 END) AS b2
           |  FROM (
           |    SELECT vec_id, cid, d2,
           |      ROW_NUMBER() OVER (PARTITION BY vec_id
           |        ORDER BY d2, cid) AS rn
           |    FROM alldist) t
           |  WHERE rn <= 2 GROUP BY vec_id),
           |sm AS (
           |  SELECT cid,
           |    CAST(CAST(
           |      CASE WHEN GREATEST(a2, b2) = 0 THEN CAST(0 AS DOUBLE)
           |        ELSE CAST(b2 - a2 AS DOUBLE) / GREATEST(a2, b2) END
           |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS s_micros
           |  FROM pt)
           |SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(s_micros) AS BIGINT) AS s_sum_micros,
           |  CAST(SUM(s_micros) AS DOUBLE) / (COUNT(*) * 1000000)
           |    AS mean_silhouette
           |FROM sm GROUP BY cid ORDER BY cid""".stripMargin) { (s, dir) =>
      val sig = SimilarityOps.signatures(s, dir)
      val cent = kmeansCentroids(s, dir)
      val pt = sig.select(col("vec_id"), col("qv"), col("norm2"))
        .crossJoin(broadcast(cent))
        .withColumn("d2",
          col("norm2") - lit(2L) * dot_long(col("qv"), col("cv")) +
            col("cnorm2"))
        .groupBy(col("vec_id"))
        .agg(sort_array(collect_list(struct(col("d2"), col("cid"))))
          .as("ds"))
        .select(col("vec_id"), col("ds")(0)("cid").as("cid"),
          col("ds")(0)("d2").as("a2"), col("ds")(1)("d2").as("b2"))
      val sm = pt.select(col("cid"), graft.functions.Cols.micros6(
        when(greatest(col("a2"), col("b2")) === 0, lit(0.0))
          .otherwise((col("b2") - col("a2")).cast("double") /
            greatest(col("a2"), col("b2")).cast("double")))
        .as("s_micros"))
      sm.groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), sum(col("s_micros")).cast("long")
          .as("s_sum_micros"))
        .select(col("cid"), col("n"), col("s_sum_micros"),
          (col("s_sum_micros").cast("double") /
            (col("n") * lit(1000000L)).cast("double"))
            .as("mean_silhouette"))
        .orderBy(col("cid"))
    },

    // Davies–Bouldin index (squared-distance variant) — the
    // cluster-quality diagnostic that reads SEPARATION, complementing
    // silhouette's per-point view: for each cluster, the worst-case
    // ratio of summed scatters to centroid separation over all other
    // clusters. On SQUARED distances every quantity is an exact
    // integer: scatter s_i² = Σdist²/n_i rides the assignment step's
    // own dist2 column (no second distance pass), separation d_ij² is
    // the centroid-table dot product, and each candidate ratio
    // (s_i² + s_j²)/d_ij² = (ssum_i·n_j + ssum_j·n_i)/(n_i·n_j·d_ij²)
    // lands as ONE truncating division to micro in DECIMAL(38,0)/
    // HUGEINT — the max picks over those deterministic integers, so
    // even the argmax is engine-exact. Identical centroids (d² = 0)
    // are skipped (NULL ratio). Plan: one K-row fold over the shared
    // k-means assignment memo + a K²-row broadcast pair table —
    // nothing at corpus scale beyond the memoized assignment.
    QuerySpec.sql(
      "cluster_davies_bouldin",
      kmeansCtes.mkString("WITH ", ",\n", ",\n") +
        s"""g AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(dist2) AS BIGINT) AS ssum
           |  FROM a$KmeansIters GROUP BY 1),
           |pd AS (SELECT a.cid AS ci, b.cid AS cj,
           |    ca.cnorm2 - 2 * CAST(list_dot_product(ca.cv, cb.cv)
           |      AS BIGINT) + cb.cnorm2 AS d2
           |  FROM g a JOIN g b ON a.cid <> b.cid
           |  JOIN c${KmeansIters - 1} ca ON ca.cid = a.cid
           |  JOIN c${KmeansIters - 1} cb ON cb.cid = b.cid),
           |r AS (SELECT pd.ci AS cid,
           |    MAX(CASE WHEN pd.d2 > 0 THEN
           |      CASE WHEN ga.ssum // ga.n + gb.ssum // gb.n >
           |          CAST(9000000000000 AS HUGEINT) * pd.d2
           |        THEN CAST(error('cluster_davies_bouldin: scatter/'
           |          || 'separation ratio exceeds the int64 micro'
           |          || ' envelope') AS HUGEINT)
           |        ELSE
           |      (ga.ssum * CAST(gb.n AS HUGEINT)
           |        + gb.ssum * CAST(ga.n AS HUGEINT)) * 1000000
           |      // (CAST(ga.n AS HUGEINT) * gb.n * pd.d2) END
           |      END) AS rm
           |  FROM pd JOIN g ga ON ga.cid = pd.ci
           |  JOIN g gb ON gb.cid = pd.cj
           |  GROUP BY 1)
           |SELECT g.cid, g.n, g.ssum,
           |  CAST(r.rm AS BIGINT) AS db_ratio_micro
           |FROM g JOIN r ON r.cid = g.cid ORDER BY g.cid""".stripMargin
    ) { (s, dir) =>
      val g = kmeansAssignments(s, dir)
        .groupBy(col("cid"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("dist2")).cast("long").as("ssum"))
      val cent = kmeansCentroids(s, dir)
      val ga = g.select(col("cid").as("ci"), col("n").as("na"),
        col("ssum").as("sa"))
      val gb = g.select(col("cid").as("cj"), col("n").as("nb"),
        col("ssum").as("sb"))
      val ca = cent.select(col("cid").as("ci"), col("cv").as("cva"),
        col("cnorm2").as("n2a"))
      val cb = cent.select(col("cid").as("cj"), col("cv").as("cvb"),
        col("cnorm2").as("n2b"))
      val r = ga.join(broadcast(gb), col("ci") =!= col("cj"))
        .join(broadcast(ca), Seq("ci"))
        .join(broadcast(cb), Seq("cj"))
        .withColumn("d2",
          col("n2a") - lit(2L) * dot_long(col("cva"), col("cvb")) +
            col("n2b"))
        .select(col("ci").as("cid"),
          // Pre-div envelope guard (r16 div-wrap audit): the micro
          // ratio is avg-scatter²/d2 scaled by 1e6, and d2 (squared
          // centroid separation) is a DATA VALUE that can be one
          // micro² unit — so the quotient is reachable past 2⁶³ by
          // scatter scale alone, where Spark's decimal div WRAPS
          // silently. The per-cluster mean-scatter compare (floor
          // divs, then a decimal product that cannot overflow:
          // 9e12·d2 ≤ ~1e31) bounds the quotient under ~9e18,
          // conservative vs the 9.223e18 wrap point, mirrored as the
          // oracle's error() branch.
          expr("CASE WHEN d2 > 0 THEN " +
            "CASE WHEN CAST(sa div na AS DECIMAL(38,0)) + (sb div nb)" +
            " > CAST(9000000000000 AS DECIMAL(38,0)) * d2" +
            " THEN raise_error(concat('cluster_davies_bouldin: '," +
            "'scatter/separation ratio exceeds the int64 micro '," +
            "'envelope'))" +
            " ELSE " +
            "CAST((sa * CAST(nb AS DECIMAL(38,0)) " +
            "+ sb * CAST(na AS DECIMAL(38,0))) * 1000000 " +
            "div (CAST(na AS DECIMAL(38,0)) * nb * d2) AS BIGINT) " +
            "END END").as("ratio"))
        .groupBy(col("cid"))
        .agg(max(col("ratio")).cast("long").as("db_ratio_micro"))
      g.join(r, Seq("cid"))
        .select(col("cid"), col("n"), col("ssum"),
          col("db_ratio_micro"))
        .orderBy(col("cid"))
    },

    // External clustering evaluation against the ground-truth labels
    // the embeddings fixture carries: PURITY (Σ per-cluster majority
    // count / N — an exact rational, one shared-text division) and
    // NMI (mutual information between the k-means partition and the
    // labels over sqrt(H(C)·H(L))). Every entropy/MI term is
    // n·micros6(ln(ratio)) — the KL-drift integer-log discipline — so
    // the sums are exact longs and even NMI hash-compares; the 1/N
    // and 1e6 scale factors cancel in the final ratio. Scale shape:
    // one row-scale equi-join (assignments ⋈ labels on vec_id, both
    // uniform), one hash aggregate to the K×|labels| contingency
    // table, and pure bounded-metadata arithmetic after — the
    // assignment memo is shared with cluster_kmeans/dedup_semantic.
    QuerySpec.sql(
      "cluster_purity_nmi",
      kmeansCtes.mkString("WITH ", ",\n", ",\n") +
        s"""ct AS (
           |  SELECT k.cid, e.label, CAST(COUNT(*) AS BIGINT) AS nij
           |  FROM a$KmeansIters k JOIN embeddings e ON e.vec_id = k.vec_id
           |  GROUP BY 1, 2),
           |ni AS (SELECT cid, CAST(SUM(nij) AS BIGINT) AS ni
           |  FROM ct GROUP BY 1),
           |mj AS (SELECT label, CAST(SUM(nij) AS BIGINT) AS mj
           |  FROM ct GROUP BY 1),
           |nt AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM ct),
           |mi AS (
           |  SELECT CAST(SUM(c.nij * CAST(CAST(ln(
           |      CAST(t.n * c.nij AS DOUBLE) / CAST(i.ni * j.mj AS DOUBLE))
           |      AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)
           |    AS mi_micros
           |  FROM ct c JOIN ni i USING (cid) JOIN mj j USING (label)
           |  CROSS JOIN nt t),
           |hc AS (
           |  SELECT CAST(SUM(ni * CAST(CAST(ln(
           |      CAST(t.n AS DOUBLE) / CAST(ni AS DOUBLE))
           |      AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)
           |    AS hc_micros
           |  FROM ni CROSS JOIN nt t),
           |hl AS (
           |  SELECT CAST(SUM(mj * CAST(CAST(ln(
           |      CAST(t.n AS DOUBLE) / CAST(mj AS DOUBLE))
           |      AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)
           |    AS hl_micros
           |  FROM mj CROSS JOIN nt t),
           |pu AS (SELECT CAST(SUM(mx) AS BIGINT) AS purity_num
           |  FROM (SELECT cid, MAX(nij) AS mx FROM ct GROUP BY 1) x)
           |SELECT t.n, pu.purity_num,
           |  CAST(pu.purity_num AS DOUBLE) / CAST(t.n AS DOUBLE) AS purity,
           |  mi.mi_micros, hc.hc_micros, hl.hl_micros,
           |  CASE WHEN hc.hc_micros > 0 AND hl.hl_micros > 0 THEN
           |    CAST(mi.mi_micros AS DOUBLE) /
           |      (sqrt(CAST(hc.hc_micros AS DOUBLE)) *
           |       sqrt(CAST(hl.hl_micros AS DOUBLE))) END AS nmi
           |FROM nt t CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl
           |CROSS JOIN pu""".stripMargin) { (s, dir) =>
      // ONE row-scale pass to the K×|labels| contingency table, then
      // the bounded table collects and the exact arithmetic runs on
      // the driver (the emb_top_pc discipline): micros6's
      // double→DECIMAL(18,6) HALF_UP rounding is mirrored with
      // BigDecimal.decimal(x).setScale(6, HALF_UP), so the driver
      // longs are bit-identical to the in-plan expression — and the
      // contingency chain is no longer recomputed per derived
      // statistic.
      val ct = kmeansAssignments(s, dir).select(col("vec_id"), col("cid"))
        .join(graft.Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("label")), Seq("vec_id"))
        .groupBy(col("cid"), col("label"))
        .agg(count(lit(1)).as("nij"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      def lnMicros(x: Double): Long =
        BigDecimal.decimal(math.log(x))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .underlying.unscaledValue.longValueExact
      val ni = ct.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
      val mj = ct.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
      val n = ct.map(_._3).sum
      val miM = ct.map { case (c, l, nij) =>
        nij * lnMicros((n * nij).toDouble / (ni(c) * mj(l)).toDouble)
      }.sum
      val hcM = ni.values.map(v => v * lnMicros(n.toDouble / v.toDouble)).sum
      val hlM = mj.values.map(v => v * lnMicros(n.toDouble / v.toDouble)).sum
      val puN = ct.groupBy(_._1).values.map(_.map(_._3).max).sum
      val nmi: java.lang.Double =
        if (hcM > 0 && hlM > 0)
          miM.toDouble / (math.sqrt(hcM.toDouble) * math.sqrt(hlM.toDouble))
        else null
      import s.implicits._
      Seq((n, puN, puN.toDouble / n.toDouble, miM, hcM, hlM,
          Option(nmi).map(_.doubleValue)))
        .toDF("n", "purity_num", "purity", "mi_micros", "hc_micros",
          "hl_micros", "nmi")
    },

    // PageRank centrality over the k-NN graph (integer mass, 5 damped
    // rounds) — graph-weighted representative scoring.
    QuerySpec.sql("graph_pagerank", pagerankOracle) { (s, dir) =>
      pagerank(s, dir)
    },

    // Semi-supervised label propagation over the k-NN graph — predict
    // a masked node's label by the majority vote of its LABELED
    // neighbors (vec_id % 5 = 0 masked, the transductive-learning
    // smoke test every graph-based SSL method reduces to at one
    // round). One join of the masked nodes' edges against the labeled
    // side, a vote aggregate bounded by k rows per node, and a
    // deterministic argmax (max count, ties to the smallest label) as
    // a max_by fold — no window. Nodes whose k neighbors are all
    // masked drop out (no votes). `correct` rides along, so the
    // transductive accuracy is itself oracle-checked.
    QuerySpec.sql(
      "graph_label_prop",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |votes AS (
         |  SELECT k.vec_id, l.label AS nbr_label,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM knn k
         |  JOIN embeddings l ON l.vec_id = k.nbr_id AND l.vec_id % 5 <> 0
         |  WHERE k.vec_id % 5 = 0
         |  GROUP BY 1, 2),
         |pick AS (SELECT vec_id, nbr_label AS predicted FROM (
         |  SELECT vec_id, nbr_label,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY cnt DESC, nbr_label) AS rn
         |  FROM votes) WHERE rn = 1)
         |SELECT p.vec_id, p.predicted, t.label AS actual,
         |  p.predicted = t.label AS correct
         |FROM pick p JOIN embeddings t ON t.vec_id = p.vec_id
         |ORDER BY p.vec_id""".stripMargin) { (s, dir) =>
      val lab = graft.Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val votes = SimilarityOps.knnEdges(s, dir, 3)
        .select(col("vec_id"), col("nbr_id"))
        .filter(col("vec_id") % 5 === 0)
        .join(lab.filter(col("vec_id") % 5 =!= 0)
          .select(col("vec_id").as("nbr_id"), col("label").as("nbr_label")),
          Seq("nbr_id"))
        .groupBy(col("vec_id"), col("nbr_label"))
        .agg(count(lit(1)).as("cnt"))
      votes.groupBy(col("vec_id"))
        .agg(max_by(col("nbr_label"),
          struct(col("cnt"), (lit(0L) - col("nbr_label")))).as("predicted"))
        .join(lab.select(col("vec_id"), col("label").as("actual")),
          Seq("vec_id"))
        .select(col("vec_id"), col("predicted"), col("actual"),
          (col("predicted") === col("actual")).as("correct"))
        .orderBy(col("vec_id"))
    },

    // Link prediction over the k-NN graph: common-neighbor count and
    // Resource-Allocation index (Σ 1/deg(z) over shared neighbors z —
    // the Adamic-Adar family member with NO log, so it stays exact:
    // each term is the integer floor(1e6/deg)) for every
    // wedge-connected pair. Same wedge join as triangle counting,
    // grouped per endpoint pair; cost bounded by Σ deg².
    QuerySpec.sql(
      "graph_link_predict",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         |deg AS (SELECT u AS z, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM sym GROUP BY 1)
         |SELECT a.v AS a_id, b.v AS b_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_common,
         |  CAST(SUM(1000000 // d.d) AS BIGINT) AS ra_x1e6
         |FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v
         |JOIN deg d ON d.z = a.u
         |GROUP BY 1, 2
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val sym = und.unionByName(
        und.select(col("v").as("u"), col("u").as("v")))
      val deg = sym.groupBy(col("u").as("z")).agg(count(lit(1)).as("d"))
      sym.select(col("u").as("z"), col("v").as("a_id"))
        .join(sym.select(col("u").as("z"), col("v").as("b_id")), Seq("z"))
        .filter(col("a_id") < col("b_id"))
        .join(deg, Seq("z"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_common"),
          sum(expr("1000000L div d")).as("ra_x1e6"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Per-node triangle counts over the undirected k-NN graph. The
    // oracle enumerates each triangle once by id order (a < b < c);
    // the Spark plan uses the degree-ordered orientation — same
    // triangle set, hub-safe task sizes.
    QuerySpec.sql(
      "graph_triangles",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |tri AS (
         |  SELECT x.u AS a, x.v AS b, y.v AS c
         |  FROM und x JOIN und y ON y.u = x.v
         |    JOIN und z ON z.u = x.u AND z.v = y.v),
         |tn AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS c FROM (
         |    SELECT a AS n FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri) m
         |  GROUP BY n)
         |SELECT s.vec_id, CAST(COALESCE(t.c, 0) AS BIGINT) AS n_triangles
         |FROM sig s LEFT JOIN tn t ON t.n = s.vec_id
         |ORDER BY s.vec_id""".stripMargin) { (s, dir) =>
      triangleCounts(s, dir)
    },

    // Global transitivity (the graph clustering coefficient):
    // 3·triangles / wedges — how much of the kNN graph's "friend of a
    // friend" structure closes into triangles, the one-number summary
    // of local density that separates a clustered corpus from a
    // hub-and-spoke one. Reuses the per-node triangle machinery
    // (rational orientation join, never Σd² worst-case) — the node
    // sum IS 3T — and wedges are Σ C(d,2) over the degree table; one
    // exact ppm division at the end.
    QuerySpec.sql(
      "graph_transitivity",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |tri AS (
         |  SELECT x.u AS a, x.v AS b, y.v AS c
         |  FROM und x JOIN und y ON y.u = x.v
         |    JOIN und z ON z.u = x.u AND z.v = y.v),
         |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
         |    SELECT u AS n FROM und UNION ALL SELECT v FROM und) m
         |  GROUP BY n),
         |agg AS (
         |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tri)
         |      AS n_triangles,
         |    (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg)
         |      AS n_wedges)
         |SELECT n_triangles, n_wedges,
         |  CASE WHEN n_wedges > 0 THEN
         |    3 * n_triangles * 1000000 // n_wedges END
         |    AS transitivity_ppm
         |FROM agg""".stripMargin) { (s, dir) =>
      val t3 = triangleCounts(s, dir)
        .agg(expr("CAST(SUM(n_triangles) div 3 AS BIGINT)")
          .as("n_triangles"))
      val und = SimilarityOps.knnEdges(s, dir, 3)
        .select(least(col("vec_id"), col("nbr_id")).as("u"),
          greatest(col("vec_id"), col("nbr_id")).as("v"))
        .distinct()
      val wedges = und.select(col("u").as("n"))
        .unionByName(und.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
        .agg(sum(expr("d * (d - 1) div 2")).cast("long").as("n_wedges"))
      t3.crossJoin(broadcast(wedges))
        .select(col("n_triangles"), col("n_wedges"),
          expr("CASE WHEN n_wedges > 0 THEN" +
            " 3 * n_triangles * 1000000 div n_wedges END")
            .as("transitivity_ppm"))
    },

    // Conductance of the LABEL partition over the k-NN graph — the
    // cut-quality eval beside modularity (modularity rewards
    // within-community density; conductance charges each class its
    // boundary: cut(S)/min(vol(S), vol(V−S))). Measures how well the
    // ANN graph respects the embedding classes — the graph-side twin
    // of cluster_purity_nmi. Everything is exact integer edge
    // counting off the symmetrized bounded k·n edge table (one join
    // to the label map, one keyed fold, one 1-row broadcast total);
    // the ppm division is integral.
    QuerySpec.sql(
      "graph_conductance",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         |lab AS (SELECT vec_id, label FROM sig),
         |es AS (
         |  SELECT la.label AS l, lb.label AS lo
         |  FROM sym JOIN lab la ON la.vec_id = sym.u
         |    JOIN lab lb ON lb.vec_id = sym.v),
         |g AS (
         |  SELECT l, CAST(COUNT(*) AS BIGINT) AS vol,
         |    CAST(COALESCE(SUM(CASE WHEN lo <> l THEN 1 END), 0)
         |      AS BIGINT) AS cut
         |  FROM es GROUP BY 1),
         |m AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS vol_total
         |  FROM und)
         |SELECT l AS label, vol, cut,
         |  CAST(CASE WHEN LEAST(vol, vol_total - vol) > 0 THEN
         |    cut * 1000000 // LEAST(vol, vol_total - vol) END
         |    AS BIGINT) AS conductance_ppm
         |FROM g, m
         |ORDER BY label""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val sym = und.unionByName(
        und.select(col("v").as("u"), col("u").as("v")))
      val lab = SimilarityOps.signatures(s, dir)
        .select(col("vec_id"), col("label"))
      val es = sym
        .join(lab.select(col("vec_id").as("u"), col("label").as("l")),
          Seq("u"))
        .join(lab.select(col("vec_id").as("v"), col("label").as("lo")),
          Seq("v"))
      val g = es.groupBy(col("l"))
        .agg(count(lit(1)).as("vol"),
          coalesce(sum(when(col("lo") =!= col("l"), 1L)), lit(0L))
            .as("cut"))
      val m = und.agg((lit(2) * count(lit(1))).cast("long")
        .as("vol_total"))
      g.crossJoin(broadcast(m))
        .select(col("l").as("label"), col("vol"), col("cut"),
          expr("CAST(CASE WHEN LEAST(vol, vol_total - vol) > 0 THEN " +
            "cut * 1000000 div LEAST(vol, vol_total - vol) END " +
            "AS BIGINT)").as("conductance_ppm"))
        .orderBy(col("label"))
    },

    // Freeman degree centralization — the one-number "is this graph a
    // star or a mesh" summary beside transitivity and assortativity:
    // Σ(d_max − d_i) normalized by the star graph's (n−1)(n−2). Exact
    // integer ppm off the degree table alone.
    QuerySpec.sql(
      "graph_centralization",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
         |    SELECT u AS n FROM und UNION ALL SELECT v FROM und) m
         |  GROUP BY n),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(MAX(d) AS BIGINT) AS dmax,
         |    CAST(SUM(d) AS BIGINT) AS sd
         |  FROM deg)
         |SELECT n AS n_nodes, dmax AS max_degree,
         |  CAST(n * dmax - sd AS BIGINT) AS centralization_num,
         |  CAST(CASE WHEN n > 2 THEN (n * dmax - sd) * 1000000
         |    // ((n - 1) * (n - 2)) END AS BIGINT)
         |    AS centralization_ppm
         |FROM a""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      und.select(col("u").as("n0"))
        .unionByName(und.select(col("v").as("n0")))
        .groupBy(col("n0")).agg(count(lit(1)).as("d"))
        .agg(count(lit(1)).as("n"), max(col("d")).as("dmax"),
          sum(col("d")).cast("long").as("sd"))
        .select(col("n").as("n_nodes"), col("dmax").as("max_degree"),
          (col("n") * col("dmax") - col("sd")).cast("long")
            .as("centralization_num"),
          expr("CAST(CASE WHEN n > 2 THEN (n * dmax - sd) * 1000000 " +
            "div ((n - 1) * (n - 2)) END AS BIGINT)")
            .as("centralization_ppm"))
    },

    // Degree assortativity of the undirected k-NN graph: Pearson r
    // over edge-endpoint degree pairs, with each edge contributing
    // both orientations (the standard symmetric formulation, which
    // collapses the closed form to (n·sxy − sx²)/(n·sxx − sx²)). All
    // sufficient statistics are exact integers from two hash
    // aggregates and one edge ⋈ degree join — the r division is the
    // only float op, identical in both engines.
    QuerySpec.sql(
      "graph_assortativity",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
         |    SELECT u AS n FROM und UNION ALL SELECT v FROM und) m
         |  GROUP BY n),
         |ends AS (
         |  SELECT du.d AS dx, dv.d AS dy
         |  FROM und JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v
         |  UNION ALL
         |  SELECT dv.d, du.d
         |  FROM und JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(dx) AS BIGINT) AS sx,
         |    CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         |    CAST(SUM(dx * dy) AS BIGINT) AS sxy
         |  FROM ends)
         |SELECT n AS n_endpoints,
         |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0 THEN
         |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |  END AS assortativity
         |FROM agg""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val deg = und.select(col("u").as("n"))
        .unionByName(und.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val joined = und
        .join(deg.select(col("n").as("un"), col("d").as("du")),
          col("un") === col("u"))
        .join(deg.select(col("n").as("vn"), col("d").as("dv")),
          col("vn") === col("v"))
        .select(col("du"), col("dv"))
      val ends = joined.select(col("du").as("dx"), col("dv").as("dy"))
        .unionByName(joined.select(col("dv").as("dx"), col("du").as("dy")))
      ends.agg(count(lit(1)).as("n"), sum(col("dx")).as("sx"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dx") * col("dy")).as("sxy"))
        .select(col("n").as("n_endpoints"), expr(
          """CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0 THEN
            |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |END""".stripMargin).as("assortativity"))
    },

    // Reciprocity of the DIRECTED k-NN graph — the fraction of "a's
    // neighbor b" edges where a is also b's neighbor. In an ANN index
    // this is the symmetry health check: low reciprocity means hub
    // vectors absorb everyone's edges while their own point elsewhere
    // (the hubness pathology that degrades graph-based search), and it
    // decides whether an undirected-graph algorithm may treat the kNN
    // edge list as symmetric. One self-join of the bounded edge table
    // on the reversed pair — k·n rows joined to itself on its key,
    // never the vector data.
    QuerySpec.sql(
      "graph_reciprocity",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |rec AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         |    CAST(COALESCE(SUM(CASE WHEN b.vec_id IS NOT NULL
         |      THEN 1 END), 0) AS BIGINT) AS n_reciprocal
         |  FROM knn a LEFT JOIN knn b
         |    ON b.vec_id = a.nbr_id AND b.nbr_id = a.vec_id)
         |SELECT n_edges, n_reciprocal,
         |  n_reciprocal * 1000000 // n_edges AS reciprocity_ppm
         |FROM rec""".stripMargin) { (s, dir) =>
      val e = SimilarityOps.knnEdges(s, dir, 3)
        .select(col("vec_id"), col("nbr_id"))
      val rev = e.select(col("vec_id").as("r_nbr"),
        col("nbr_id").as("r_vec"))
      e.join(rev,
          col("r_vec") === col("vec_id") && col("r_nbr") === col("nbr_id"),
          "left")
        .agg(count(lit(1)).as("n_edges"),
          coalesce(sum(when(col("r_vec").isNotNull, 1L)), lit(0L))
            .as("n_reciprocal"))
        .select(col("n_edges"), col("n_reciprocal"),
          expr("n_reciprocal * 1000000 div n_edges")
            .as("reciprocity_ppm"))
    },

    // Newman modularity of the label partition on the k-NN graph —
    // "how community-like is the class structure": Q = Σ_c e_c/m −
    // Σ_c (K_c/2m)², evaluated as the single exact rational
    // (4m·Σe_c − ΣK_c²) / 4m² so every input to the one final
    // division is an exact integer from three hash aggregates (intra-
    // edge counts, degree mass per community, edge total).
    QuerySpec.sql(
      "graph_modularity",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |e AS (SELECT la.label AS cl, CAST(COUNT(*) AS BIGINT) AS ec
         |  FROM und
         |  JOIN lab la ON la.vec_id = u
         |  JOIN lab lb ON lb.vec_id = v AND lb.label = la.label
         |  GROUP BY 1),
         |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
         |    SELECT u AS n FROM und UNION ALL SELECT v FROM und) x
         |  GROUP BY 1),
         |kc AS (SELECT l.label, CAST(SUM(deg.d) AS BIGINT) AS kk
         |  FROM deg JOIN lab l ON l.vec_id = deg.n GROUP BY 1),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
         |s1 AS (SELECT CAST(COALESCE(SUM(ec), 0) AS BIGINT) AS se FROM e),
         |s2 AS (SELECT CAST(SUM(kk * kk) AS BIGINT) AS sk2,
         |    CAST(COUNT(*) AS BIGINT) AS nc FROM kc)
         |SELECT m, nc AS n_communities, se AS intra_edges,
         |  4 * m * se - sk2 AS q_num,
         |  CAST(4 * m * se - sk2 AS DOUBLE)
         |    / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS modularity
         |FROM mm, s1, s2""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val lab = graft.Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val e = und
        .join(lab.select(col("vec_id").as("u"), col("label").as("la")),
          Seq("u"))
        .join(lab.select(col("vec_id").as("v"), col("label").as("lb")),
          Seq("v"))
        .filter(col("la") === col("lb"))
      val deg = und.select(col("u").as("n"))
        .unionByName(und.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val kc = deg.join(lab.select(col("vec_id").as("n"), col("label")),
          Seq("n"))
        .groupBy(col("label")).agg(sum(col("d")).as("kk"))
      val mm = und.agg(count(lit(1)).as("m"))
      val s1 = e.agg(coalesce(count(lit(1)), lit(0L)).as("se"))
      val s2 = kc.agg(sum(col("kk") * col("kk")).cast("long").as("sk2"),
        count(lit(1)).as("nc"))
      mm.crossJoin(broadcast(s1)).crossJoin(broadcast(s2))
        .select(col("m"), col("nc").as("n_communities"),
          col("se").as("intra_edges"),
          (lit(4L) * col("m") * col("se") - col("sk2")).as("q_num"),
          ((lit(4L) * col("m") * col("se") - col("sk2")).cast("double") /
            (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
            .as("modularity"))
    },

    // 2-hop receptive field — the GNN statistic: per node, the
    // distinct strictly-two-hop neighborhood size alongside its
    // degree (a 2-layer message-passing model reads exactly
    // degree + n_two_hop rows per node; the sum over nodes is the
    // layer's gather volume). One wedge self-join on the pivot key +
    // one anti-join against direct edges + one count — on a k-NN
    // graph the pivot fan-out is bounded by the (k + in-degree) cap,
    // so the wedge join stays task-balanced; on a power-law graph
    // you'd salt the pivot like the triangle gate's degree-ordered
    // orientation.
    QuerySpec.sql(
      "graph_two_hop",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |sym AS (SELECT u, v FROM und
         |  UNION ALL SELECT d.v AS u, d.u AS v FROM und d),
         |two AS (SELECT DISTINCT a.u AS n, b.v AS w
         |  FROM sym a JOIN sym b ON b.u = a.v WHERE b.v <> a.u),
         |strict2 AS (SELECT n, w FROM two
         |  EXCEPT SELECT u, v FROM sym),
         |c2 AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM strict2 GROUP BY 1),
         |deg AS (SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM sym GROUP BY 1)
         |SELECT s.vec_id,
         |  CAST(COALESCE(deg.d, 0) AS BIGINT) AS degree,
         |  CAST(COALESCE(c2.c, 0) AS BIGINT) AS n_two_hop,
         |  CAST(COALESCE(deg.d, 0) + COALESCE(c2.c, 0) AS BIGINT)
         |    AS receptive_2
         |FROM sig s
         |LEFT JOIN deg ON deg.n = s.vec_id
         |LEFT JOIN c2 ON c2.n = s.vec_id
         |ORDER BY s.vec_id""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val sym = und.unionByName(
        und.select(col("v").as("u"), col("u").as("v")))
      val two = sym.select(col("u").as("n"), col("v").as("m"))
        .join(sym.select(col("u").as("m"), col("v").as("w")), Seq("m"))
        .filter(col("w") =!= col("n"))
        .select(col("n"), col("w")).distinct()
      val strict2 = two.join(
        sym.select(col("u").as("n"), col("v").as("w")),
        Seq("n", "w"), "left_anti")
      val c2 = strict2.groupBy(col("n")).agg(count(lit(1)).as("c"))
      val deg = sym.groupBy(col("u").as("n")).agg(count(lit(1)).as("d"))
      SimilarityOps.signatures(s, dir).select(col("vec_id"))
        .join(deg, col("n") === col("vec_id"), "left").drop("n")
        .withColumnRenamed("d", "degree0")
        .join(c2, col("n") === col("vec_id"), "left").drop("n")
        .select(col("vec_id"),
          coalesce(col("degree0"), lit(0L)).as("degree"),
          coalesce(col("c"), lit(0L)).as("n_two_hop"),
          (coalesce(col("degree0"), lit(0L)) +
            coalesce(col("c"), lit(0L))).as("receptive_2"))
        .orderBy(col("vec_id"))
    },

    // Sampled-source closeness centrality: BFS frontier expansion
    // from BfsSources hash-picked sources, BfsRounds rounds — the
    // standard approximation for closeness on a graph too big for
    // all-pairs (Eppstein–Wang: O(log n / ε²) sources suffice). Per
    // round: one shuffle join (frontier ⋈ edges) + one min-distance
    // aggregate, state bounded by sources × reached nodes; the same
    // MATERIALIZED-CTE ladder as the k-core gate keeps the oracle
    // from re-expanding the chain. Distances are exact integers, the
    // ppm ratio is integer division — hash-exact.
    QuerySpec.sql(
      "graph_closeness_sample",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |sym AS MATERIALIZED (SELECT u, v FROM und
         |  UNION ALL SELECT d.v AS u, d.u AS v FROM und d),
         |srcs AS MATERIALIZED (SELECT vec_id AS src FROM sig
         |  ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
         |    1, 13)) AS BIGINT), vec_id
         |  LIMIT $BfsSources),
         |d0 AS MATERIALIZED (
         |  SELECT src, src AS node, CAST(0 AS BIGINT) AS d FROM srcs),
         |${(1 to BfsRounds).map { i =>
            s"""d$i AS MATERIALIZED (
               |  SELECT src, node, MIN(d) AS d FROM (
               |    SELECT src, node, d FROM d${i - 1}
               |    UNION ALL
               |    SELECT p.src, s.v AS node, p.d + 1
               |    FROM d${i - 1} p JOIN sym s ON s.u = p.node) m
               |  GROUP BY 1, 2)""".stripMargin
          }.mkString(",\n")}
         |SELECT src, CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
         |  CAST(SUM(d) AS BIGINT) AS sum_dist,
         |  CASE WHEN SUM(d) > 0 THEN
         |    CAST((COUNT(*) - 1) * 1000000 // SUM(d) AS BIGINT)
         |  END AS closeness_ppm
         |FROM d$BfsRounds GROUP BY 1
         |ORDER BY src""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val sym = Materialize.stable(und.unionByName(
        und.select(col("v").as("u"), col("u").as("v"))))
      var dist = SimilarityOps.signatures(s, dir).select(col("vec_id"))
        .orderBy(graft.functions.Md5Prefix
          .md5_prefix_long(col("vec_id").cast("string"), 13),
          col("vec_id"))
        .limit(BfsSources)
        .select(col("vec_id").as("src"), col("vec_id").as("node"),
          lit(0L).as("d"))
      for (_ <- 1 to BfsRounds) {
        val expanded = dist.select(col("src"), col("node").as("u"),
            col("d"))
          .join(sym, Seq("u"))
          .select(col("src"), col("v").as("node"),
            (col("d") + 1).as("d"))
        dist = Materialize.stable(
          dist.unionByName(expanded)
            .groupBy(col("src"), col("node"))
            .agg(min(col("d")).as("d")))
      }
      dist.groupBy(col("src"))
        .agg((count(lit(1)) - 1).as("n_reached"),
          sum(col("d")).as("sum_dist"))
        .select(col("src"), col("n_reached"), col("sum_dist"),
          when(col("sum_dist") > 0,
            expr("CAST(n_reached * 1000000 div sum_dist AS BIGINT)"))
            .as("closeness_ppm"))
        .orderBy(col("src"))
    },

    // Degree distribution of the k-NN graph — the first plot of any
    // graph report (and the skew evidence the salting decisions in
    // this file rest on). Isolated nodes ride along via the left
    // join. Two hash aggregates.
    QuerySpec.sql(
      "graph_degree_dist",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |sym AS (SELECT u, v FROM und
         |  UNION ALL SELECT d2.v AS u, d2.u AS v FROM und d2),
         |deg AS (SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM sym GROUP BY 1)
         |SELECT CAST(COALESCE(deg.d, 0) AS BIGINT) AS degree,
         |  CAST(COUNT(*) AS BIGINT) AS n_nodes
         |FROM sig s LEFT JOIN deg ON deg.n = s.vec_id
         |GROUP BY 1
         |ORDER BY degree""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val deg = und.select(col("u").as("n"))
        .unionByName(und.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      SimilarityOps.signatures(s, dir).select(col("vec_id"))
        .join(deg, col("n") === col("vec_id"), "left")
        .groupBy(coalesce(col("d"), lit(0L)).as("degree"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("degree"))
    },

    // 4-cycle census — the bipartite-structure signal beside the
    // triangle count (a 4-cycle is two nodes sharing TWO neighbors:
    // co-citation / co-purchase squares). Exact identity: every
    // 4-cycle is counted by its two opposite pairs, so
    // C4 = Σ_{u<v} C(codeg(u,v), 2) / 2 — one wedge self-join on the
    // pivot (the same shape as link prediction's common-neighbor
    // table) + one integer fold. No cycle enumeration anywhere.
    QuerySpec.sql(
      "graph_four_cycles",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |sym AS (SELECT u, v FROM und
         |  UNION ALL SELECT d.v AS u, d.u AS v FROM und d),
         |cod AS (
         |  SELECT a.v AS a_id, b.v AS b_id,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v
         |  GROUP BY 1, 2)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_codeg_pairs,
         |  CAST(MAX(c) AS BIGINT) AS max_codeg,
         |  CAST(COALESCE(SUM(c * (c - 1)), 0) // 4 AS BIGINT)
         |    AS n_four_cycles
         |FROM cod""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val sym = und.unionByName(
        und.select(col("v").as("u"), col("u").as("v")))
      sym.select(col("u").as("z"), col("v").as("a_id"))
        .join(sym.select(col("u").as("z"), col("v").as("b_id")),
          Seq("z"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_codeg_pairs"),
          max(col("c")).as("max_codeg"),
          expr("CAST(COALESCE(SUM(c * (c - 1)), 0) div 4 AS BIGINT)")
            .as("n_four_cycles"))
    },

    // HyperANF — the neighborhood function N(t) (how many nodes are
    // within t hops, averaged over ALL sources) estimated with one
    // 64-register HLL PER NODE instead of 2000 BFS frontiers
    // (Boldi-Rosa-Vigna 2011, the canonical web-graph diameter
    // machinery). Registers merge by MAX, and max is exactly what a
    // BFS union needs: after round t each node's sketch holds the HLL
    // of its ≤t-hop ball. Per round: one shuffle join (registers ⋈
    // edges) + one max-aggregate on (node, bucket) — state is
    // nodes × 64 rows whatever the graph, which is the entire point
    // at 100 TB. All register math is integer; the per-node estimate
    // reuses the sketch_hll_distinct closed form, rounds to 6
    // decimals, and the per-round DECIMAL sums compare hash-exact.
    QuerySpec.sql(
      "graph_hyperanf", {
        def estSql(src: String): String =
          s"""SELECT node,
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
             |  FROM (SELECT node, CAST(COUNT(*) AS BIGINT) AS used,
             |      CAST(SUM(CAST(POW(2, 47 - mj) AS BIGINT)) AS BIGINT)
             |        AS s_used
             |    FROM $src GROUP BY 1) a""".stripMargin
        s"""WITH sig AS (${SimilarityOps.quantizedSql}),
           |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
           |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
           |    GREATEST(vec_id, nbr_id) AS v FROM knn),
           |sym AS MATERIALIZED (SELECT u, v FROM und
           |  UNION ALL SELECT d.v AS u, d.u AS v FROM und d),
           |h AS (SELECT vec_id AS node,
           |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 13))
           |      AS BIGINT) AS hv
           |  FROM sig),
           |r0 AS MATERIALIZED (SELECT node, hv % 64 AS bucket,
           |    CASE WHEN hv >> 6 = 0 THEN 47
           |      ELSE 47 - length(bin(hv >> 6)) END AS mj
           |  FROM h),
           |${(1 to HyperAnfRounds).map { i =>
              s"""r$i AS MATERIALIZED (
                 |  SELECT node, bucket, MAX(mj) AS mj FROM (
                 |    SELECT node, bucket, mj FROM r${i - 1}
                 |    UNION ALL
                 |    SELECT s.v AS node, p.bucket, p.mj
                 |    FROM r${i - 1} p JOIN sym s ON s.u = p.node) m
                 |  GROUP BY 1, 2)""".stripMargin
            }.mkString(",\n")}
           |${(0 to HyperAnfRounds).map { i =>
              s"""SELECT CAST($i AS BIGINT) AS t,
                 |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 |  CAST(CAST(SUM(CAST(est AS DECIMAL(18,6)))
                 |    AS DECIMAL(38,6)) AS DOUBLE) AS sum_est
                 |FROM (${estSql(s"r$i")}) e$i""".stripMargin
            }.mkString("\nUNION ALL\n")}
           |ORDER BY t""".stripMargin
      }) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val sym = Materialize.stable(und.unionByName(
        und.select(col("v").as("u"), col("u").as("v"))))
      val h = SimilarityOps.signatures(s, dir)
        .select(col("vec_id").as("node"),
          graft.functions.Md5Prefix.md5_prefix_long(
            col("vec_id").cast("string"), 13).as("hv"))
      var regs: DataFrame = h.select(col("node"),
        pmod(col("hv"), lit(64L)).as("bucket"),
        when(shiftright(col("hv"), 6) === 0, lit(47))
          .otherwise(lit(47) - length(bin(shiftright(col("hv"), 6))))
          .as("mj"))
      def roundSum(t: Int, r: DataFrame): DataFrame = {
        val agg = r.groupBy(col("node"))
          .agg(count(lit(1)).as("used"),
            sum(expr("CAST(POW(2, 47 - mj) AS BIGINT)")).as("s_used"))
        val raw = lit(0.709) * lit(4096.0) * lit(140737488355328.0) /
          (col("s_used") +
            (lit(64L) - col("used")) * lit(140737488355328L))
            .cast("double")
        agg.select(col("node"),
            when(raw <= lit(160.0) && col("used") < 64,
              lit(64.0) *
                log(lit(64.0) / (lit(64L) - col("used")).cast("double")))
              .otherwise(raw).as("est"))
          .agg(count(lit(1)).as("n_nodes"),
            sum(col("est")
                .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
              .cast(org.apache.spark.sql.types.DecimalType(38, 6))
              .cast("double").as("sum_est"))
          .select(lit(t.toLong).as("t"), col("n_nodes"), col("sum_est"))
      }
      var out = roundSum(0, regs)
      for (i <- 1 to HyperAnfRounds) {
        val pushed = regs.select(col("node").as("u"), col("bucket"),
            col("mj"))
          .join(sym, Seq("u"))
          .select(col("v").as("node"), col("bucket"), col("mj"))
        regs = Materialize.stable(
          regs.unionByName(pushed)
            .groupBy(col("node"), col("bucket"))
            .agg(max(col("mj")).as("mj")))
        out = out.unionByName(roundSum(i, regs))
      }
      out.orderBy(col("t"))
    },

    // k-core peel trajectory of the k-NN graph (k = 4): per peel
    // round, the surviving node/edge counts until the cascade
    // stabilizes (on this graph the 4-core collapses — min degree is
    // 3 — and the TRAJECTORY is the informative output: how many
    // rounds the cascade takes and how fast mass drains is the
    // degeneracy profile SNAP-style graph reports publish). Exactly
    // KcoreRounds rounds in both engines — peeling is idempotent at
    // the fixpoint, so trailing rounds just repeat the converged
    // counts and the hash compare stays exact whatever round the
    // cascade actually stops. Each round is one alive-filter join +
    // one degree aggregate; the per-round counts are driver-bounded
    // (one row per round), same budget discipline as k-means /
    // connected components.
    QuerySpec.sql(
      "graph_kcore_peel",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |e0 AS MATERIALIZED (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |${(1 to KcoreRounds).map { i =>
            // MATERIALIZED: each round references its predecessor three
            // times — inlined CTEs would re-expand the whole chain
            // exponentially (and re-open the parquet at every leaf)
            val pe = if (i == 1) "e0" else s"e${i - 1}"
            s"""a$i AS MATERIALIZED (SELECT n FROM (SELECT u AS n FROM $pe
               |    UNION ALL SELECT v FROM $pe) m
               |  GROUP BY n HAVING COUNT(*) >= $KcoreK),
               |e$i AS MATERIALIZED (SELECT u, v FROM $pe
               |  JOIN a$i au ON au.n = u JOIN a$i av ON av.n = v)"""
              .stripMargin
          }.mkString(",\n")}
         |${(0 to KcoreRounds).map { i =>
            s"""SELECT CAST($i AS BIGINT) AS k_round,
               |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
               |    (SELECT DISTINCT n FROM (SELECT u AS n FROM e$i
               |      UNION ALL SELECT v FROM e$i) m) d) AS n_nodes,
               |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e$i) AS n_edges"""
              .stripMargin
          }.mkString("\nUNION ALL\n")}
         |ORDER BY k_round""".stripMargin) { (s, dir) =>
      var edges = undirectedEdges(s, dir)
      val trace = Seq.newBuilder[(Long, Long, Long)]
      // per-round snapshot: ONE aggregate job for (nodes, edges)
      def counts(e: DataFrame): (Long, Long) = {
        val r = e.select(col("u").as("n"))
          .unionByName(e.select(col("v").as("n")))
          .agg(countDistinct(col("n")).as("nodes"),
            count(lit(1)).as("ends"))
          .collect()(0)
        (r.getLong(0), r.getLong(1) / 2)
      }
      val (n0, m0) = counts(edges)
      trace += ((0L, n0, m0))
      for (i <- 1 to KcoreRounds) {
        val deg = edges.select(col("u").as("n"))
          .unionByName(edges.select(col("v").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("d"))
        val keep = Materialize.stable(
          deg.filter(col("d") >= KcoreK).select(col("n")))
        edges = Materialize.stable(edges
          .join(keep.select(col("n").as("ku")), col("ku") === col("u"))
          .join(keep.select(col("n").as("kv")), col("kv") === col("v"))
          .select(col("u"), col("v")))
        val (n, m) = counts(edges)
        trace += ((i.toLong, n, m))
      }
      import s.implicits._
      trace.result().toDF("k_round", "n_nodes", "n_edges")
        .orderBy(col("k_round"))
    },

    // Rich-club coefficient φ(k) over the undirected k-NN graph: for
    // each degree threshold k, the density of the subgraph induced by
    // nodes of degree > k — do the hubs preferentially interlink?
    // Exact ppm off the degree table: n_k nodes and e_k edges whose
    // BOTH endpoints clear the bar, φ = 2e_k/(n_k(n_k−1)). The
    // threshold grid is a 6-row broadcast literal; the only
    // edge-scale work is the one edge ⋈ degree join every other graph
    // gate already pays, then two 6-row folds.
    QuerySpec.sql(
      "graph_rich_club",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
         |    SELECT u AS n FROM und UNION ALL SELECT v FROM und) m
         |  GROUP BY n),
         |ks AS (SELECT CAST(k AS BIGINT) AS k
         |  FROM (VALUES (1), (2), (3), (4), (5), (6)) t(k)),
         |nk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k
         |  FROM ks JOIN deg ON d > k GROUP BY 1),
         |em AS (SELECT LEAST(du.d, dv.d) AS dmin
         |  FROM und JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v),
         |ek AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS e_k
         |  FROM ks JOIN em ON dmin > k GROUP BY 1)
         |SELECT ks.k AS k,
         |  CAST(COALESCE(nk.n_k, 0) AS BIGINT) AS n_rich,
         |  CAST(COALESCE(ek.e_k, 0) AS BIGINT) AS e_rich,
         |  CAST(CASE WHEN COALESCE(nk.n_k, 0) >= 2
         |    THEN COALESCE(ek.e_k, 0) * 2000000
         |      // (nk.n_k * (nk.n_k - 1)) END AS BIGINT) AS phi_ppm
         |FROM ks LEFT JOIN nk ON nk.k = ks.k
         |LEFT JOIN ek ON ek.k = ks.k
         |ORDER BY k""".stripMargin) { (s, dir) =>
      import s.implicits._
      val und = undirectedEdges(s, dir)
      val deg = und.select(col("u").as("n"))
        .unionByName(und.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val ks = (1L to 6L).toDF("k")
      val nk = deg.crossJoin(broadcast(ks))
        .filter(col("d") > col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
      val em = und
        .join(deg.select(col("n").as("un"), col("d").as("du")),
          col("un") === col("u"))
        .join(deg.select(col("n").as("vn"), col("d").as("dv")),
          col("vn") === col("v"))
        .select(least(col("du"), col("dv")).as("dmin"))
      val ek = em.crossJoin(broadcast(ks))
        .filter(col("dmin") > col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("e_k"))
      ks.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
        .select(col("k"),
          coalesce(col("n_k"), lit(0L)).cast("long").as("n_rich"),
          coalesce(col("e_k"), lit(0L)).cast("long").as("e_rich"),
          expr("CAST(CASE WHEN COALESCE(n_k, 0) >= 2 " +
            "THEN COALESCE(e_k, 0) * 2000000 " +
            "div (n_k * (n_k - 1)) END AS BIGINT)").as("phi_ppm"))
        .orderBy(col("k"))
    },

    // HITS hubs & authorities over the DIRECTED k-NN graph — the
    // query-independent link-analysis pair beside PageRank: an
    // authority is pointed at by good hubs, a hub points at good
    // authorities. Two mutual-reinforcement rounds unrolled in
    // integer micro-mass, each followed by an exact L∞ normalization
    // (x·10⁶ // max — the max is a 1-row broadcast), so every score
    // is a deterministic integer both engines reproduce; isolated
    // directions coalesce to 0 at the final node join. Per round: two
    // shuffle-on-key joins + two hash aggregates, same cost shape as
    // one PageRank round; the oracle unrolls identical MATERIALIZED
    // CTEs.
    QuerySpec.sql(
      "graph_hits",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS MATERIALIZED (SELECT vec_id, nbr_id
         |  FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |nodes AS (SELECT DISTINCT vec_id FROM sig),
         |a1 AS MATERIALIZED (SELECT nbr_id AS id,
         |    CAST(COUNT(*) AS BIGINT) * 1000000 AS a
         |  FROM knn GROUP BY 1),
         |am1 AS (SELECT MAX(a) AS m FROM a1),
         |a1n AS MATERIALIZED (SELECT id,
         |    CAST(a * 1000000 // m AS BIGINT) AS a FROM a1, am1),
         |h1 AS MATERIALIZED (SELECT k.vec_id AS id,
         |    CAST(SUM(x.a) AS BIGINT) AS h
         |  FROM knn k JOIN a1n x ON x.id = k.nbr_id GROUP BY 1),
         |hm1 AS (SELECT MAX(h) AS m FROM h1),
         |h1n AS MATERIALIZED (SELECT id,
         |    CAST(h * 1000000 // m AS BIGINT) AS h FROM h1, hm1),
         |a2 AS MATERIALIZED (SELECT k.nbr_id AS id,
         |    CAST(SUM(x.h) AS BIGINT) AS a
         |  FROM knn k JOIN h1n x ON x.id = k.vec_id GROUP BY 1),
         |am2 AS (SELECT MAX(a) AS m FROM a2),
         |a2n AS MATERIALIZED (SELECT id,
         |    CAST(a * 1000000 // m AS BIGINT) AS a FROM a2, am2),
         |h2 AS MATERIALIZED (SELECT k.vec_id AS id,
         |    CAST(SUM(x.a) AS BIGINT) AS h
         |  FROM knn k JOIN a2n x ON x.id = k.nbr_id GROUP BY 1),
         |hm2 AS (SELECT MAX(h) AS m FROM h2),
         |h2n AS MATERIALIZED (SELECT id,
         |    CAST(h * 1000000 // m AS BIGINT) AS h FROM h2, hm2)
         |SELECT n.vec_id AS vec_id,
         |  CAST(COALESCE(h.h, 0) AS BIGINT) AS hub_micro,
         |  CAST(COALESCE(a.a, 0) AS BIGINT) AS auth_micro
         |FROM nodes n
         |LEFT JOIN h2n h ON h.id = n.vec_id
         |LEFT JOIN a2n a ON a.id = n.vec_id
         |ORDER BY auth_micro DESC, vec_id""".stripMargin) { (s, dir) =>
      val knn = Materialize.stable(
        SimilarityOps.knnEdges(s, dir, 3)
          .select(col("vec_id"), col("nbr_id")))
      val nodes = SimilarityOps.signatures(s, dir).select(col("vec_id"))
      def lInfNorm(df: DataFrame, c: String): DataFrame = {
        val m = df.agg(max(col(c)).as("m"))
        Materialize.stable(df.crossJoin(broadcast(m))
          .select(col("id"),
            expr(s"CAST($c * 1000000 div m AS BIGINT)").as(c)))
      }
      val a1 = lInfNorm(
        knn.groupBy(col("nbr_id").as("id"))
          .agg((count(lit(1)) * lit(1000000L)).cast("long").as("a")),
        "a")
      val h1 = lInfNorm(
        knn.join(a1.withColumnRenamed("id", "nbr_id"), Seq("nbr_id"))
          .groupBy(col("vec_id").as("id"))
          .agg(sum(col("a")).cast("long").as("h")),
        "h")
      val a2 = lInfNorm(
        knn.join(h1.withColumnRenamed("id", "vec_id"), Seq("vec_id"))
          .groupBy(col("nbr_id").as("id"))
          .agg(sum(col("h")).cast("long").as("a")),
        "a")
      val h2 = lInfNorm(
        knn.join(a2.withColumnRenamed("id", "nbr_id"), Seq("nbr_id"))
          .groupBy(col("vec_id").as("id"))
          .agg(sum(col("a")).cast("long").as("h")),
        "h")
      nodes
        .join(h2.withColumnRenamed("id", "vec_id"), Seq("vec_id"),
          "left")
        .join(a2.withColumnRenamed("id", "vec_id"), Seq("vec_id"),
          "left")
        .select(col("vec_id"),
          coalesce(col("h"), lit(0L)).cast("long").as("hub_micro"),
          coalesce(col("a"), lit(0L)).cast("long").as("auth_micro"))
        .orderBy(col("auth_micro").desc, col("vec_id"))
    },

    // Katz centrality over the directed k-NN graph — the third
    // classic link-analysis score beside PageRank (out-degree-
    // normalized random walk) and HITS (mutual reinforcement): Katz
    // counts ALL inbound walks, attenuated by length, so a node fed
    // by long chains still accumulates mass where one PageRank round
    // dilutes it. Exact truncated series in integer micro-mass:
    // x₀ = 10⁶, x_{t+1}(v) = 10⁶ + (Σ_{u→v} x_t(u)) div 4 — the
    // attenuation β = 1/4 is an exact truncating shift, and with
    // out-degree 3 the spectral radius obeys βλ ≤ 3/4 < 1, so the
    // 3-round truncation is the convergent series' exact integer
    // partial sum (remainder < (3/4)³ of the mass, documented — not a
    // float approximation of it). Per round: one shuffle-on-key join
    // + one hash aggregate, the PageRank cost shape; the oracle
    // unrolls identical MATERIALIZED CTEs.
    QuerySpec.sql(
      "graph_katz", {
        def round(prev: String, out: String) =
          s"""$out AS MATERIALIZED (SELECT n.vec_id,
             |    CAST(1000000 + COALESCE(SUM(x.katz), 0) // 4
             |      AS BIGINT) AS katz
             |  FROM nodes n
             |  LEFT JOIN knn k ON k.nbr_id = n.vec_id
             |  LEFT JOIN $prev x ON x.vec_id = k.vec_id
             |  GROUP BY 1)""".stripMargin
        s"""WITH sig AS (${SimilarityOps.quantizedSql}),
           |knn AS MATERIALIZED (SELECT vec_id, nbr_id
           |  FROM (${SimilarityOps.knnEdgesSql(3)}) k),
           |nodes AS (SELECT DISTINCT vec_id FROM sig),
           |x0 AS (SELECT vec_id, CAST(1000000 AS BIGINT) AS katz
           |  FROM nodes),
           |${round("x0", "x1")},
           |${round("x1", "x2")},
           |${round("x2", "x3")}
           |SELECT vec_id, katz AS katz_micro FROM x3
           |ORDER BY katz_micro DESC, vec_id""".stripMargin
      }) { (s, dir) =>
      val knn = Materialize.stable(
        SimilarityOps.knnEdges(s, dir, 3)
          .select(col("vec_id"), col("nbr_id")))
      val nodes = SimilarityOps.signatures(s, dir)
        .select(col("vec_id")).distinct()
      def round(prev: DataFrame): DataFrame = Materialize.stable(
        nodes
          .join(knn.select(col("vec_id").as("src"),
            col("nbr_id").as("vec_id")), Seq("vec_id"), "left")
          .join(prev.select(col("vec_id").as("src"),
            col("katz").as("xk")), Seq("src"), "left")
          .groupBy(col("vec_id"))
          .agg(expr("CAST(1000000 + COALESCE(SUM(xk), 0) div 4 " +
            "AS BIGINT)").as("katz")))
      val x0 = nodes.withColumn("katz", lit(1000000L))
      val x3 = round(round(round(x0)))
      x3.select(col("vec_id"), col("katz").as("katz_micro"))
        .orderBy(col("katz_micro").desc, col("vec_id"))
    },

    // Edge embeddedness distribution — per edge, the Jaccard overlap
    // of its endpoints' OTHER neighborhoods (|N(u)∩N(v)| /
    // |N(u)∪N(v)\{u,v}|): embeddedness 0 marks a LOCAL BRIDGE (the
    // Granovetter weak tie information flows across), deciles near 10
    // mark redundant intra-cluster ties. Common-neighbor counts come
    // from the same wedge join graph_link_predict pays; the output
    // folds to an 11-bucket decile histogram (+ the degenerate
    // no-other-neighbor bucket at −1), so the per-edge frame never
    // leaves the cluster. Exact ppm floor division per edge.
    QuerySpec.sql(
      "graph_edge_embeddedness",
      s"""WITH sig AS (${SimilarityOps.quantizedSql}),
         |knn AS (SELECT vec_id, nbr_id FROM (${SimilarityOps.knnEdgesSql(3)}) k),
         |und AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS u,
         |    GREATEST(vec_id, nbr_id) AS v FROM knn),
         |sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         |deg AS (SELECT u AS z, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM sym GROUP BY 1),
         |cm AS (SELECT a.v AS u, b.v AS v,
         |    CAST(COUNT(*) AS BIGINT) AS common
         |  FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v
         |  GROUP BY 1, 2),
         |e AS (SELECT und.u, und.v, COALESCE(cm.common, 0) AS common,
         |    du.d AS du, dv.d AS dv
         |  FROM und LEFT JOIN cm ON cm.u = und.u AND cm.v = und.v
         |  JOIN deg du ON du.z = und.u JOIN deg dv ON dv.z = und.v),
         |b AS (SELECT CASE WHEN du + dv - 2 - common <= 0 THEN -1
         |    ELSE common * 1000000 // (du + dv - 2 - common) // 100000
         |    END AS bucket
         |  FROM e)
         |SELECT CAST(bucket AS BIGINT) AS decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_edges
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val und = undirectedEdges(s, dir)
      val sym = und.unionByName(
        und.select(col("v").as("u"), col("u").as("v")))
      val deg = sym.groupBy(col("u").as("z")).agg(count(lit(1)).as("d"))
      val cm = sym.select(col("u").as("z"), col("v").as("cu"))
        .join(sym.select(col("u").as("z"), col("v").as("cv")),
          Seq("z"))
        .filter(col("cu") < col("cv"))
        .groupBy(col("cu").as("u"), col("cv").as("v"))
        .agg(count(lit(1)).as("common"))
      und.join(cm, Seq("u", "v"), "left")
        .join(deg.select(col("z").as("u"), col("d").as("du")),
          Seq("u"))
        .join(deg.select(col("z").as("v"), col("d").as("dv")),
          Seq("v"))
        .select(coalesce(col("common"), lit(0L)).as("common"),
          col("du"), col("dv"))
        .select(expr("CASE WHEN du + dv - 2 - common <= 0 THEN -1 " +
          "ELSE common * 1000000 div (du + dv - 2 - common) " +
          "div 100000 END").as("decile"))
        .groupBy(col("decile").cast("long").as("decile"))
        .agg(count(lit(1)).as("n_edges"))
        .orderBy(col("decile"))
    })

  /** Peel threshold and round cap for [[graph_kcore_peel]]'s oracle
    * unrolling. */
  val KcoreK = 4
  val KcoreRounds = 6

  /** BFS closeness sampling: source count and hop budget. */
  val BfsSources = 4
  val BfsRounds = 4

  /** HyperANF register-merge rounds (neighborhood function N(1..t)). */
  val HyperAnfRounds = 4
}
