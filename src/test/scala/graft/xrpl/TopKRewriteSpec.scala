package graft.xrpl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopKPerKeyExec, TopKWindowRewrite}

/** The optimizer rule must turn the standard `row_number <= k` window
  * spelling into a heap-pruned plan (TopKPerKeyExec feeding the
  * window) without changing the result under a total order.
  */
class TopKRewriteSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  lazy val spark = {
    val s = SparkTest.session
    TopKWindowRewrite.install(s)
    s
  }

  // the session is shared across suites — leave no rule behind, so
  // other specs' plan-shape assertions see the stock optimizer
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == TopKWindowRewrite)
    super.afterAll()
  }

  private def orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")

  private val w = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  test("rn <= k rewrites to a heap-pruned window and keeps the result") {
    val df = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val plan = { df.collect(); df.queryExecution.executedPlan }
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(nodes)
    }
    assert(nodes(plan).exists(_.isInstanceOf[TopKPerKeyExec]),
      "rewrite did not fire:\n" + plan)

    // ground truth from a session WITHOUT the rewrite: drop the rule,
    // rebuild the plan, compare row sets, then reinstall
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == TopKWindowRewrite)
    val expected = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(_.toSeq).toSet
    TopKWindowRewrite.install(spark)
    assert(df.collect().map(_.toSeq).toSet === expected)
    assert(expected.nonEmpty)
  }

  test("rank() and rn >= k spellings do NOT rewrite") {
    val rankDf = orders
      .withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    rankDf.collect()
    val rankPlan = rankDf.queryExecution.executedPlan.toString
    assert(!rankPlan.contains("TopKPerKey"),
      "rank() must not prune at k (ties can exceed k rows)")

    val tailDf = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") >= 3)
    tailDf.collect()
    assert(!tailDf.queryExecution.executedPlan.toString
      .contains("TopKPerKey"), "rn >= k keeps the tail - no prune")
  }
}
