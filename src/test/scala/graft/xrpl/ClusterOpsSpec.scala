package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterOps

/** Invariants of the deterministic k-means and k-NN PageRank — the
  * cross-engine value checks live in the DuckDB gates
  * (cluster_kmeans / graph_pagerank); here we pin the structural
  * contracts and the scale-relevant plan shapes.
  */
class ClusterOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("kmeans assigns every vector exactly once, to a valid cluster") {
    val a = ClusterOps.kmeansAssignments(spark, dir).cache()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(a.count() === n)
    assert(a.select("vec_id").distinct().count() === n)
    val cids = a.select("cid").distinct().collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf((0L until ClusterOps.K.toLong).toSet))
    assert(cids.size > 1, "degenerate single-cluster result")
    a.unpersist()
  }

  test("kmeans assignment plan broadcasts the centroid side") {
    val plan = ClusterOps.kmeansAssignments(spark, dir)
      .queryExecution.executedPlan.toString
    // The corpus x centroid step must be a broadcast (K-row build
    // side), never a shuffled or cartesian corpus-vs-corpus join.
    assert(plan.contains("Broadcast"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("pagerank: one rank per node, mass bounds, sink floor") {
    val r = ClusterOps.pagerank(spark, dir).cache()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(r.count() === n)
    assert(r.select("vec_id").distinct().count() === n)
    // Every node holds at least the teleport mass; total mass never
    // exceeds the initial n * RankScale (dangling mass only leaks out).
    val agg = r.agg(min(col("rank")), sum(col("rank"))).first()
    assert(agg.getLong(0) >= ClusterOps.TeleportMass)
    assert(agg.getLong(1) <= n * ClusterOps.RankScale)
    // Two-sided: {rank == TeleportMass} must be EXACTLY the no-in-edge
    // set from the k-NN edge list. Sound in both directions: a node
    // with an in-edge receives floor(0.85 · Σ contrib) with every
    // contrib ≥ floor(TeleportMass / k) ≫ 1, so its rank strictly
    // exceeds the teleport mass; a node with none gets exactly it.
    // Non-vacuous whichever way the fixture falls.
    val edges = graft.SparkEntry.queries("sim_knn_graph")(spark, dir)
    val atTeleport = r.filter(col("rank") === ClusterOps.TeleportMass)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val withIn = edges.select("nbr_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val allNodes = r.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(atTeleport === (allNodes -- withIn))
    r.unpersist()
  }

  test("pagerank is invariant to input partitioning (integer mass)") {
    val a = ClusterOps.pagerank(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = ClusterOps.pagerank(spark, dir).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
