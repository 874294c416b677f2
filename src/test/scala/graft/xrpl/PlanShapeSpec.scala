package graft.xrpl

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan invariants for the round-6 operators — the scale
  * claims stated in PLANS.md, asserted so a regression fails a test
  * instead of silently re-introducing a single-task window or a
  * nested-loop join. Runs on sf0.001 (plan shape is scale-independent
  * for these properties).
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(collectNodes)) ++
      p.subqueries.flatMap(collectNodes)

  test("no unpartitioned window in any relational/time-series gate plan") {
    for (name <- Seq("skyline_orders", "ts_ewma", "ts_rolling_median",
        "w7_rank_distribution", "w8_value_windows", "a_mode_per_user",
        "pivot_event_daily", "quantile_disc_grouped")) {
      val bad = collectNodes(planOf(name)).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name plans an unpartitioned WindowExec")
    }
  }

  test("q4 EXISTS plans as a semi join, not a distinct+inner join") {
    val s = planOf("q4_order_priority").toString
    assert(s.contains("LeftSemi"), s.linesIterator.take(25).mkString("\n"))
  }

  test("no nested-loop or cartesian join in the new pair/join gates") {
    for (name <- Seq("mm_phash_near_dup", "dedup_lsh_verified",
        "dedup_winnow_pairs", "j_asof_next_order", "graph_triangles",
        "graph_link_predict", "j_asof_nearest_order")) {
      val s = planOf(name).toString
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct"),
        s"$name plans a nested-loop/cartesian join")
    }
  }

  test("cube expands in one aggregate pass (single Expand, no union)") {
    val s = planOf("agg_cube_orders").toString
    assert(s.contains("Expand"))
    assert(!s.contains("Union"), s.linesIterator.take(25).mkString("\n"))
  }
}
