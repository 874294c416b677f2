package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured decision for the r16 verdict's deferred item #8: would
  * graph_kcore_peel be faster as ONE lazy union-of-snapshots tree
  * (relying on exchange reuse to deduplicate the shared round
  * prefixes) than as the shipped driver-interleaved rounds with two
  * `Materialize.stable` truncations per round?
  *
  * The structural risk being measured: round i's edge set references
  * round i−1 three times (once directly, twice through the degree
  * filter), so the un-truncated logical tree grows ~3^rounds nodes —
  * the exact blow-up the oracle's MATERIALIZED CTEs exist to stop.
  * Exchange reuse deduplicates EXECUTION of identical exchanges, but
  * analysis/optimization still walks the full tree.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.KcoreTreeBench"
  * Results recorded in OPTIMIZATION_r17.md.
  */
object KcoreTreeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.build(cpus, "graft-kcore-tree-bench")
    val k = graft.operators.ClusterOps.KcoreK
    val rounds = graft.operators.ClusterOps.KcoreRounds

    def edges0: DataFrame = graft.operators.SimilarityOps
      .knnEdges(spark, sfDir, 3)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct()

    def degKeep(e: DataFrame): DataFrame = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= k).select(col("n"))

    def peel(e: DataFrame, keep: DataFrame): DataFrame = e
      .join(keep.select(col("n").as("ku")), col("ku") === col("u"))
      .join(keep.select(col("n").as("kv")), col("kv") === col("v"))
      .select(col("u"), col("v"))

    // A: the shipped shape — driver-interleaved rounds, stable() per
    // round, one counts collect per snapshot
    def runCheckpointed(): Seq[(Long, Long, Long)] = {
      var edges = graft.functions.Materialize.stable(edges0)
      def counts(e: DataFrame): (Long, Long) = {
        val r = e.select(col("u").as("n"))
          .unionByName(e.select(col("v").as("n")))
          .agg(countDistinct(col("n")).as("nodes"),
            count(lit(1)).as("ends"))
          .collect()(0)
        (r.getLong(0), r.getLong(1) / 2)
      }
      val out = Seq.newBuilder[(Long, Long, Long)]
      val (n0, m0) = counts(edges)
      out += ((0L, n0, m0))
      for (i <- 1 to rounds) {
        val keep = graft.functions.Materialize.stable(degKeep(edges))
        edges = graft.functions.Materialize.stable(peel(edges, keep))
        val (n, m) = counts(edges)
        out += ((i.toLong, n, m))
      }
      out.result()
    }

    // B: one lazy union-of-snapshots tree, single action
    def runLazy(): Seq[(Long, Long, Long)] = {
      def countsDf(e: DataFrame, i: Int): DataFrame =
        e.select(col("u").as("n"))
          .unionByName(e.select(col("v").as("n")))
          .agg(countDistinct(col("n")).as("nodes"),
            count(lit(1)).as("ends"))
          .select(lit(i.toLong).as("k_round"), col("nodes"),
            (col("ends") / 2).cast("long").as("edges"))
      var e = edges0
      val snaps = Seq.newBuilder[DataFrame]
      snaps += countsDf(e, 0)
      for (i <- 1 to rounds) {
        e = peel(e, degKeep(e))
        snaps += countsDf(e, i)
      }
      snaps.result().reduce(_ unionAll _).orderBy(col("k_round"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }

    def time[A](reps: Int)(body: => A): (Double, A) = {
      var last: A = body // warm
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        last = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"  rep: $dt%.3f s"); Console.flush()
        dt
      }
      (runs.min, last)
    }
    val variants = if (args.isEmpty) Set("a", "b") else args.toSet
    if (variants("a")) {
      println("checkpointed rounds (warm + 3 reps):")
      val (ta, ra) = time(3)(runCheckpointed())
      println(f"checkpointed rounds: $ta%.3f s -> $ra")
    }
    if (variants("b")) {
      println("lazy single tree (warm + 3 reps):")
      val (tb, rb) = time(3)(runLazy())
      println(f"lazy single tree:    $tb%.3f s -> $rb")
    }
    spark.stop()
  }
}
