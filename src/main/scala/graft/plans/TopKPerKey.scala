package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per key WITHOUT a per-key
  * sort — the one SURVEY-preference-(c) operator the built-ins can't
  * express efficiently.
  *
  * The DataFrame spelling (`row_number().over(partitionBy(key)
  * .orderBy(...)) <= k`) plans a WindowExec: a full shuffle of every
  * row, then a full sort of every key's rows, to keep only k of them.
  * This operator keeps a bounded heap of k rows per key instead:
  *
  *  - **partial pass** (map-side, no distribution requirement): each
  *    input partition reduces to ≤ k rows per key it has seen — the
  *    shuffle then moves at most k·partitions rows per key, not the
  *    key's full history (the aggregation-style combine, applied to
  *    top-k);
  *  - **final pass** (requires [[ClusteredDistribution]] on the key,
  *    which EnsureRequirements satisfies with one hash shuffle):
  *    merges the partial heaps to the exact per-key top-k.
  *
  * Heap comparisons use a codegen'd row ordering
  * ([[GenerateOrdering]]); per-partition memory is k rows per
  * distinct key — the same bound as an aggregation buffer. The
  * ordering must be total (include a tiebreaker) for deterministic
  * results, the same contract as every rank gate.
  */
object TopKPerKey {

  /** Top `k` rows per `keys` group, ordered by `order` — (column
    * name, descending?) pairs, first k under that sort. The sort list
    * is built as pure catalyst objects (no Column conversion: the
    * Spark 4 converter leaves connect-internal node references inside
    * the produced SortOrder, which are not task-serializable).
    * Output columns = input columns; output order is unspecified
    * (sort afterwards if needed).
    */
  def topK(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(
        _.isInstanceOf[TopKPerKeyStrategy.type]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    val keyExprs: Seq[Expression] = keys.map(attr)
    val sortOrders = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftPlanBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, sortOrders, k, analyzed))
  }
}

case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan)
      : LogicalPlan = copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // the final pass preserves the clustering it required
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = output
    val keyExprs = keys
    val sortOrders = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrders, childOutput)
      // min-heap under the REVERSED ordering ⇒ head = the worst of
      // the current k, evicted when a better row arrives
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            limit, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.values.asScala.iterator.flatMap(_.iterator.asScala)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}
