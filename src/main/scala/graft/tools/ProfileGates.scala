package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.{Sessions, SparkEntry}

/** Optimization-round measurement harness (guide §1): splits each
  * gate's wall time into Catalyst planning vs execution, and counts
  * the Spark jobs / stages / tasks / Exchange nodes one evaluation
  * costs. On the tiny driver SFs most gates are overhead-bound, so
  * these counts — not bytes — are what per-gate seconds track; every
  * Exchange removed is simultaneously a real shuffle removed at
  * warehouse scale.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ProfileGates [out.tsv]"
  * honors SPARK_GRAFT_ONLY / SPARK_GRAFT_CPUS like Bench. Measurement
  * tool only — never on a query path (driver-side counters are fine).
  */
object ProfileGates {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(cpus, "graft-profile")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })

    def evalFull(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // same untimed warmup set as Bench: shared caches + base tables
    def warm(name: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable =>
          System.err.println(s"profile: WARN warmup '$name' failed: ${e.getMessage}")
      }
    warm("entry")(SparkEntry.entry(spark).count())
    Seq("xrpl_stats_daily", "dedup_minhash_lsh", "dedup_minhash_banded",
      "dedup_connected_components", "dedup_substring", "sim_ivf_topk",
      "text_winnow", "sim_knn_graph", "cluster_kmeans", "dedup_ngram_jaccard",
      "graph_triangles", "emb_pq_encode", "dedup_prefix_filter",
      "decontaminate", "text_bpe_train", "er_entity_clusters",
      "q6_filtered_revenue", "s_topk_orders", "w4_avg_event_gap",
      "j6_left_join_profile", "text_token_stats"
    ).foreach(n => warm(n)(evalFull(n)))

    val sb = new StringBuilder
    sb.append("gate\tcold_plan_ms\tcold_exec_ms\tplan_ms\texec_ms\tjobs\tstages\ttasks\texchanges\n")
    SparkEntry.sections.foreach { case (_, sspecs, release) =>
      sspecs.filter(q => only.forall(_(q.name))).foreach { q =>
        try {
          // cold pass: construction (memo fills, eager checkpoints) +
          // analysis + optimizer + physical planning (pre-AQE)
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(q.name)(spark, sfDir)
          val plan = df.queryExecution.executedPlan
          val planMs = (System.nanoTime() - t0) / 1e6
          val planStr = plan.toString
          val exchanges = "(?m)Exchange ".r.findAllIn(planStr).length
          val t1 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          val execMs = (System.nanoTime() - t1) / 1e6

          // warm pass: what a bench rep ≥2 actually pays — memos are
          // filled, JIT is hot; construction+planning re-runs per rep.
          val t2 = System.nanoTime()
          val df2 = SparkEntry.queries(q.name)(spark, sfDir)
          df2.queryExecution.executedPlan
          val planMs2 = (System.nanoTime() - t2) / 1e6
          // drain the async listener bus before sampling counters:
          // late-delivered Stage/JobEnd events would otherwise be
          // attributed to the NEXT gate (r16 ADVICE)
          def drained[A](sample: => A): A = {
            org.apache.spark.GraftListenerBridge
              .drainListenerBus(spark.sparkContext, 10000)
            sample
          }
          val (j0, s0, k0) = drained((jobs.get, stages.get, tasks.get))
          val t3 = System.nanoTime()
          df2.write.mode("overwrite").format("noop").save()
          val execMs2 = (System.nanoTime() - t3) / 1e6
          val (j1, s1, k1) = drained((jobs.get, stages.get, tasks.get))
          sb.append(f"${q.name}\t$planMs%.1f\t$execMs%.1f\t$planMs2%.1f\t$execMs2%.1f\t${j1 - j0}\t${s1 - s0}\t${k1 - k0}\t$exchanges\n")
        } catch {
          case e: Throwable =>
            System.err.println(s"profile: ${q.name} FAILED: ${e.getMessage}")
            sb.append(s"${q.name}\tERR\tERR\tERR\tERR\t0\t0\t0\t0\n")
        }
      }
      if (only.isEmpty) {
        try release(spark, sfDir) catch { case _: Throwable => () }
        System.gc()
      }
    }
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "target/profile_gates.tsv")
    java.nio.file.Files.createDirectories(out.toAbsolutePath.getParent)
    java.nio.file.Files.write(out, sb.toString.getBytes("UTF-8"))
    println(s"profile: wrote ${out}")
    spark.stop()
  }
}
