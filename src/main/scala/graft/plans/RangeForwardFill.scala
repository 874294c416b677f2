package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution,
  OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator keyed forward fill — the scale-safe as-of merge as
  * ONE physical operator over ONE range exchange (the
  * [[GlobalCumsum]] treatment applied to last-non-null-carry).
  *
  * Semantics: over rows globally ordered by `sortOrder` (whose PREFIX
  * of `numKeys` expressions is the reset key), emit every input row
  * plus one column holding the most recent non-null `valueAttr` seen
  * within the current key run — exactly
  * `last(value, ignoreNulls=true) OVER (PARTITION BY key ORDER BY rest
  * ROWS UNBOUNDED PRECEDING)`, provided the sort order puts the key
  * columns first (key runs are then contiguous in the global order).
  *
  * History (r17): [[graft.functions.AsOfJoin]] spelled this two ways —
  *  - the per-key window: one hash exchange + WindowExec, which
  *    BUFFERS every (key) group in an ExternalAppendOnlyUnsafeRowArray
  *    before emitting, and serializes a pathological hot key into one
  *    task;
  *  - the skew-proof bucketed variant: `repartitionByRange` + pid
  *    projection + a SECOND full-data hash exchange for the
  *    (pid, key) window + persist + per-bucket aggregate + carry
  *    window + broadcast join + eager localCheckpoint — ~3 extra jobs
  *    and 2 full-data exchanges per call.
  *
  * This operator is both at once: skew-proof (a hot key spans many
  * range partitions; boundaries are stitched with a bounded carry) and
  * minimal (ONE range exchange, streaming O(1)-state fill, no window
  * buffering, no persist, no checkpoint, no driver action beyond a
  * bounded ≤ one-summary-row-per-partition collect that runs INSIDE
  * doExecute over the same shuffled RDD — both passes see the
  * identical partition assignment by construction, the soundness
  * property the r16 GlobalCumsum work established).
  *
  * Boundary-carry correctness: range partitioning keeps equal keys
  * contiguous across the global partition order, so the only key that
  * can need history from partition p-1 is the key that STRADDLES the
  * boundary — i.e. partition p's first key == partition p-1's last
  * key. Pass 1 therefore summarizes each partition as (first key,
  * last key, last non-null value of the last key); the driver folds
  * these in partition order into one optional (key, value) carry per
  * partition, handling empty partitions and keys that span many
  * partitions with no non-null rows in between.
  *
  * Determinism contract: rows with equal (key, remaining sort keys)
  * must either be order-insensitive for the fill (e.g. only probe
  * rows, which never update it) or fully tie-broken by the sort keys
  * — the same contract the old window formulation had.
  */
object RangeForwardFill {

  /** `df` ++ `outName` = last non-null `value` within the current
    * `keys` run, over rows globally ordered by (`keys` ++ `order`).
    */
  def fill(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      value: Column, outName: String): DataFrame = {
    val spark = df.sparkSession
    GraftStrategies.register(spark)

    // Pre-project key/value expressions so ordinary analysis resolves
    // them, and lift the resolved SortOrder out of a throwaway
    // sortWithinPartitions (the Spark 4 Column→Expression bridge
    // yields opaque column nodes, so resolution must go through the
    // analyzer — same technique as [[GlobalCumsum.cumsum]]).
    def kCol(i: Int) = s"__ffill_k_$i"
    val vCol = "__ffill_v"
    val prepared = df.select(
      org.apache.spark.sql.functions.col("*") +:
        (keys.zipWithIndex.map { case (k, i) => k.as(kCol(i)) } :+
          value.as(vCol)): _*)
      .sortWithinPartitions(
        keys.indices.map(i => org.apache.spark.sql.functions.col(kCol(i))) ++
          order: _*)
    val (sortOrder, analyzed) = prepared.queryExecution.analyzed match {
      case org.apache.spark.sql.catalyst.plans.logical.Sort(so, _, child, _) =>
        (so, child)
      case other => throw new IllegalStateException(
        s"expected analyzed Sort, got ${other.getClass}")
    }
    val helperAttrs = analyzed.output.takeRight(keys.size + 1)
    val keyAttrs = helperAttrs.take(keys.size)
    val valueAttr = helperAttrs.last
    val fillAttr =
      AttributeReference(outName, valueAttr.dataType, nullable = true)()

    val node = RangeForwardFillNode(sortOrder, keyAttrs, valueAttr,
      fillAttr, analyzed)
    GraftPlanBridge.ofRows(spark, node)
      .drop(keys.indices.map(kCol) :+ vCol: _*)
  }
}

case class RangeForwardFillNode(sortOrder: Seq[SortOrder],
    keyAttrs: Seq[Attribute], valueAttr: Attribute, fillAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ fillAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(fillAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class RangeForwardFillExec(sortOrder: Seq[SortOrder],
    keyAttrs: Seq[Attribute], valueAttr: Attribute, fillAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ fillAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(fillAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(sortOrder) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(sortOrder)
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortOrder

  import RangeForwardFillExec.Boundary

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kAttrs = keyAttrs
    val vAttr = valueAttr
    val outAttrs = output
    val valueType = vAttr.dataType
    val shuffled = child.execute()

    // Pass 1 (one bounded job over the SAME shuffled RDD — the map
    // stage's files are reused, so both passes see the identical
    // partition assignment): per-partition boundary summaries,
    // ≤ 1 small row per partition.
    val summaries: Array[(Int, Boundary)] = shuffled
      .mapPartitionsWithIndex { (idx, iter) =>
        val keyProj = UnsafeProjection.create(kAttrs, childOutput)
        val valProj = UnsafeProjection.create(Seq(vAttr), childOutput)
        var firstKey: UnsafeRow = null
        var curKey: UnsafeRow = null
        var lastVal: UnsafeRow = null
        iter.foreach { row =>
          val k = keyProj(row)
          if (curKey == null || k != curKey) {
            curKey = k.copy()
            if (firstKey == null) firstKey = curKey
            lastVal = null // new key run: fill state resets
          }
          val v = valProj(row)
          if (!v.isNullAt(0)) lastVal = v.copy()
        }
        if (curKey == null) Iterator.empty
        else Iterator.single((idx, Boundary(firstKey, curKey, lastVal)))
      }.collect()

    // Driver fold (partition-index order, bounded by the partition
    // count): the carry entering each partition — the (key, value) a
    // straddling key brings in from earlier partitions.
    val nParts = shuffled.getNumPartitions
    val carryKey = Array.fill[UnsafeRow](nParts)(null)
    val carryVal = Array.fill[UnsafeRow](nParts)(null)
    val byIdx = summaries.sortBy(_._1).toMap
    var curKey: UnsafeRow = null
    var curVal: UnsafeRow = null
    var p = 0
    while (p < nParts) {
      carryKey(p) = curKey
      carryVal(p) = curVal
      byIdx.get(p).foreach { b =>
        if (b.lastValue != null) { curKey = b.lastKey; curVal = b.lastValue }
        else if (curKey != null && b.lastKey == curKey) ()
        else { curKey = b.lastKey; curVal = null }
      }
      p += 1
    }

    // Pass 2: stream each partition once with O(1) fill state.
    shuffled.mapPartitionsWithIndex { (idx, iter) =>
      val keyProj = UnsafeProjection.create(kAttrs, childOutput)
      val valProj = UnsafeProjection.create(Seq(vAttr), childOutput)
      val outProj = UnsafeProjection.create(outAttrs, childOutput :+ fillAttr)
      val fillRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var curKey: UnsafeRow = carryKey(idx)
      var lastVal: UnsafeRow = carryVal(idx)
      iter.map { row =>
        val k = keyProj(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy()
          lastVal = null
        }
        val v = valProj(row)
        if (!v.isNullAt(0)) lastVal = v.copy()
        fillRow.update(0,
          if (lastVal == null || lastVal.isNullAt(0)) null
          else lastVal.get(0, valueType))
        outProj(joined(row, fillRow))
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object RangeForwardFillExec {
  /** Per-partition boundary summary: first key, last key, and the
    * last non-null value OF THE LAST KEY (null when that key run has
    * no non-null value inside this partition). All UnsafeRow copies —
    * small (one key + one value), serializable for the collect.
    * Top-level so the task result does not capture the exec node.
    */
  private[plans] case class Boundary(firstKey: UnsafeRow,
    lastKey: UnsafeRow, lastValue: UnsafeRow)
}
