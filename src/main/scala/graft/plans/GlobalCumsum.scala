package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution,
  OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types._

/** Whole-operator global cumulative sum — the scale-safe two-pass
  * prefix sum as ONE physical operator over ONE range exchange.
  *
  * History (r16): the previous [[graft.functions.PrefixSum]] spelling
  * built the two passes out of stock operators — range exchange →
  * `spark_partition_id()` project → a SECOND full-data hash exchange
  * for the pid-keyed local window, plus either (a) an eager persist +
  * driver collect + eager localCheckpoint per call (three extra jobs
  * and a full materialization), or (b) a lazy single tree whose two
  * branches each materialized their own copy of the range exchange.
  * (b) is UNSOUND: `RangePartitioner` samples its bounds with an
  * RDD-id-dependent seed, so two physical materializations of the
  * same logical exchange can split rows differently, and the offsets
  * then join against the wrong partitions (observed as a
  * nondeterministic rank drift on stats_mannwhitney /
  * store_hilbert_skipping before this operator existed).
  *
  * This operator makes the consistency structural instead of
  * accidental:
  *
  *  - it REQUIRES [[OrderedDistribution]] on the sort keys (planned by
  *    EnsureRequirements as one range exchange, sized by
  *    `spark.sql.shuffle.partitions` and AQE-coalescible — the
  *    partition count is scale-adaptive, not a hard-coded constant)
  *    and per-partition ordering on the same keys;
  *  - `doExecute` runs ONE bounded job over the SAME child RDD to
  *    collect per-partition running totals (≤ one row per partition —
  *    bounded by the partition count, never by the data; the shuffle
  *    map stage is computed once and its files are re-read by the main
  *    pass, so both passes see the identical partition assignment BY
  *    CONSTRUCTION);
  *  - the main pass streams each partition once, emitting
  *    input-row ++ running sums seeded with the exclusive prefix of
  *    the collected totals.
  *
  * Compared to the r15 spelling this removes, per call site: one
  * full-data hash exchange, one persist, one driver collect of the
  * totals AS A SEPARATE ACTION (the collect still exists but runs
  * inside the operator, bounded identically), one eager
  * localCheckpoint materialization, and the pid-keyed WindowExec.
  *
  * Determinism contract (unchanged): ties must be fully broken by the
  * sort keys. Accumulation is sequential in sort order within each
  * partition and partition-by-partition for the offsets, so integer /
  * decimal results are exact. Double accumulation SEEDS each
  * partition with its exclusive offset ((offset + v1) + v2 + …),
  * which is a different FP association than the old keyed window's
  * local-sum-then-offset ((v1 + … + vk) + offset) — last-ulp drift on
  * non-first partitions is possible in principle; the committed
  * digests are byte-identical because every double-valued call site
  * quantizes or the inputs are dyadic (r16 ADVICE, scaladoc corrected
  * r17). Results are run-to-run deterministic either way: one
  * materialization, one partition assignment, one fold order.
  *
  * Overflow parity with the ANSI Sum the old window used: Long
  * accumulation uses `Math.addExact` (throws past 2^63), decimal
  * emission checks the Sum result precision (p+10 capped at 38) and
  * throws when exceeded — silent wraps stay impossible in both
  * engines.
  */
object GlobalCumsum {

  /** Which running aggregate each value column accumulates. */
  sealed trait Agg extends Serializable
  case object AggSum extends Agg
  case object AggMax extends Agg

  /** `df` ++ one running-sum column per (value, outName), over rows
    * globally ordered by `sortKeys`.
    */
  def cumsum(df: DataFrame, sortKeys: Seq[Column],
      values: Seq[(Column, String)]): DataFrame =
    runningAgg(df, sortKeys, values, AggSum, exclusive = false)

  /** `df` ++ one EXCLUSIVE running-max column per (value, outName):
    * the max over all STRICTLY PRECEDING rows in the global
    * `sortKeys` order (null on the first row) — the skyline/Pareto
    * prefix-max, `max(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` without the single-task window.
    */
  def runningMaxExclusive(df: DataFrame, sortKeys: Seq[Column],
      values: Seq[(Column, String)]): DataFrame =
    runningAgg(df, sortKeys, values, AggMax, exclusive = true)

  private def runningAgg(df: DataFrame, sortKeys: Seq[Column],
      values: Seq[(Column, String)], agg: Agg, exclusive: Boolean)
      : DataFrame = {
    val spark = df.sparkSession
    GraftStrategies.register(spark)

    // Pre-project the value expressions so ordinary analysis resolves
    // them (they may be arbitrary expressions, not just columns); the
    // helper columns are dropped again after the operator. The sort
    // keys resolve the same way: a throwaway sortWithinPartitions is
    // analyzed and its resolved SortOrder list is lifted out (the
    // Spark 4 Column→Expression bridge yields opaque column-node
    // wrappers, so name resolution must go through the analyzer).
    def vCol(i: Int) = s"__cumsum_v_$i"
    val prepared = df.select(
      org.apache.spark.sql.functions.col("*") +:
        values.zipWithIndex.map { case ((v, _), i) => v.as(vCol(i)) }: _*)
      .sortWithinPartitions(sortKeys: _*)
    val (sortOrder, analyzed) = prepared.queryExecution.analyzed match {
      case org.apache.spark.sql.catalyst.plans.logical.Sort(order, _, child, _) =>
        (order, child)
      case other => throw new IllegalStateException(
        s"expected analyzed Sort, got ${other.getClass}")
    }
    val valueAttrs = analyzed.output.takeRight(values.size)

    val cumAttrs: Seq[Attribute] = values.zipWithIndex.map {
      case ((_, out), i) =>
        AttributeReference(out,
          resultType(valueAttrs(i).dataType, agg))()
    }
    val node = GlobalCumsumNode(sortOrder, valueAttrs, cumAttrs, agg,
      exclusive, analyzed)
    GraftPlanBridge.ofRows(spark, node)
      .drop(values.indices.map(vCol): _*)
  }

  /** Accumulator per value column: null-skipping running sum/max with
    * the stock window aggregate's semantics (stays null until the
    * first non-null). Narrow integer/float inputs dispatch on their
    * actual type (an UnsafeRow zero-fills its slot before putInt /
    * putFloat, so an unconditional getLong/getDouble would read
    * zero-extended or bit-reinterpreted garbage — latent until r17,
    * when no call site passed narrow types).
    */
  private[plans] def makeAccs(inTypes: Seq[DataType], agg: Agg)
      : Array[CumAcc] = agg match {
    case AggSum => inTypes.map {
      case dt: DecimalType => new DecimalAcc(dt.precision, dt.scale): CumAcc
      case dt @ (ByteType | ShortType | IntegerType | LongType) =>
        new LongAcc(dt): CumAcc
      case dt @ (FloatType | DoubleType) => new DoubleAcc(dt): CumAcc
      case other => throw new IllegalStateException(s"cumsum over $other")
    }.toArray
    case AggMax => inTypes.map {
      case dt => new MaxAcc(dt): CumAcc

    }.toArray
  }

  /** Result type of the running aggregate — Sum matches Catalyst's
    * `Sum` so the operator is a drop-in for the old
    * `sum(...).over(window)` local pass (dtype parity with the DuckDB
    * oracle depends on it); Max preserves the input type like
    * Catalyst's `Max`.
    */
  private[plans] def resultType(dt: DataType, agg: Agg): DataType =
    agg match {
      case AggMax => dt
      case AggSum => dt match {
        case dt: DecimalType =>
          DecimalType(math.min(dt.precision + 10, DecimalType.MAX_PRECISION),
            dt.scale)
        case ByteType | ShortType | IntegerType | LongType => LongType
        case FloatType | DoubleType => DoubleType
        case other => throw new IllegalArgumentException(
          s"cumsum over unsupported type $other")
      }
    }
}

case class GlobalCumsumNode(sortOrder: Seq[SortOrder],
    valueAttrs: Seq[Attribute], cumAttrs: Seq[Attribute],
    agg: GlobalCumsum.Agg, exclusive: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ cumAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cumAttrs)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class GlobalCumsumExec(sortOrder: Seq[SortOrder],
    valueAttrs: Seq[Attribute], cumAttrs: Seq[Attribute],
    agg: GlobalCumsum.Agg, exclusive: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ cumAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cumAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(sortOrder) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(sortOrder)
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortOrder

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val vAttrs = valueAttrs
    val cAttrs = cumAttrs
    val outAttrs = output
    val inTypes = valueAttrs.map(_.dataType)
    val outTypes = cumAttrs.map(_.dataType)
    val aggKind = agg
    val excl = exclusive
    val makeAccs = GlobalCumsum.makeAccs _
    val shuffled = child.execute()

    // Pass 1 (one bounded job over the SAME shuffled RDD — the map
    // stage's output is reused, so partitioning is identical by
    // construction): per-partition totals, ≤ 1 row per partition.
    val totals: Array[(Int, Array[Any])] = shuffled
      .mapPartitionsWithIndex { (idx, iter) =>
        val proj = UnsafeProjection.create(vAttrs, childOutput)
        val accs = makeAccs(inTypes, aggKind)
        iter.foreach { row =>
          val v = proj(row)
          var i = 0
          while (i < accs.length) { accs(i).add(v, i); i += 1 }
        }
        Iterator.single((idx, accs.map(_.state)))
      }.collect()

    if (sys.env.contains("GRAFT_CUMSUM_DEBUG"))
      System.err.println(s"[cumsum-debug] doExecute rddId=${shuffled.id} " +
        s"parts=${shuffled.getNumPartitions} totals=" +
        totals.sortBy(_._1).map(t => t._2.mkString(",")).mkString("|"))
    // Exclusive running offsets, accumulated partition-by-partition in
    // index order on the driver (bounded by the partition count).
    val nParts = shuffled.getNumPartitions
    val offsets = Array.fill[Array[Any]](nParts)(null)
    val running = makeAccs(inTypes, aggKind)
    totals.sortBy(_._1).foreach { case (idx, tot) =>
      offsets(idx) = running.map(_.state)
      var i = 0
      while (i < running.length) { running(i).merge(tot(i)); i += 1 }
    }

    // Pass 2: stream each partition once, emitting row ++ running
    // aggregates (in exclusive mode the row's own value is added
    // AFTER emission, so each row sees only strict predecessors).
    shuffled.mapPartitionsWithIndex { (idx, iter) =>
      val proj = UnsafeProjection.create(vAttrs, childOutput)
      val accs = makeAccs(inTypes, aggKind)
      val off = offsets(idx)
      var i = 0
      while (i < accs.length) { accs(i).merge(off(i)); i += 1 }
      val cumRow = new GenericInternalRow(accs.length)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, childOutput ++ cAttrs)
      iter.map { row =>
        val v = proj(row)
        var j = 0
        while (j < accs.length) {
          if (excl) {
            cumRow.update(j, accs(j).emit(outTypes(j)))
            accs(j).add(v, j)
          } else {
            accs(j).add(v, j)
            cumRow.update(j, accs(j).emit(outTypes(j)))
          }
          j += 1
        }
        outProj(joined(row, cumRow))
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Null-skipping running-sum state machine; `state` must be a small
  * serializable value (it crosses the driver in the totals collect).
  */
private[plans] sealed trait CumAcc extends Serializable {
  def add(row: InternalRow, i: Int): Unit
  def merge(state: Any): Unit
  def state: Any
  def emit(outType: DataType): Any
}

private[plans] final class LongAcc(inType: DataType) extends CumAcc {
  private var has = false
  private var acc = 0L
  // dispatch on the INPUT type: an UnsafeRow stores narrow integers in
  // a zero-filled 8-byte slot, so getLong on an IntegerType column
  // would zero-extend negatives into garbage (r16 ADVICE)
  private def read(row: InternalRow, i: Int): Long = inType match {
    case LongType => row.getLong(i)
    case IntegerType => row.getInt(i).toLong
    case ShortType => row.getShort(i).toLong
    case ByteType => row.getByte(i).toLong
    case other => throw new IllegalStateException(s"LongAcc over $other")
  }
  def add(row: InternalRow, i: Int): Unit =
    if (!row.isNullAt(i)) {
      val v = read(row, i)
      acc = if (has) Math.addExact(acc, v) else v
      has = true
    }
  def merge(state: Any): Unit = state match {
    case null => ()
    case l: java.lang.Long =>
      acc = if (has) Math.addExact(acc, l.longValue) else l.longValue
      has = true
  }
  def state: Any = if (has) java.lang.Long.valueOf(acc) else null
  def emit(outType: DataType): Any = state
}

private[plans] final class DoubleAcc(inType: DataType) extends CumAcc {
  private var has = false
  private var acc = 0.0
  private def read(row: InternalRow, i: Int): Double = inType match {
    case DoubleType => row.getDouble(i)
    case FloatType => row.getFloat(i).toDouble
    case other => throw new IllegalStateException(s"DoubleAcc over $other")
  }
  def add(row: InternalRow, i: Int): Unit =
    if (!row.isNullAt(i)) {
      acc = if (has) acc + read(row, i) else read(row, i)
      has = true
    }
  def merge(state: Any): Unit = state match {
    case null => ()
    case d: java.lang.Double =>
      acc = if (has) acc + d.doubleValue else d.doubleValue
      has = true
  }
  def state: Any = if (has) java.lang.Double.valueOf(acc) else null
  def emit(outType: DataType): Any = state
}

/** Null-skipping running max over any atomic (orderable) type — the
  * [[GlobalCumsum.runningMaxExclusive]] accumulator. Values are
  * copied out of their source rows ([[InternalRow.copyValue]]) so the
  * retained max never aliases a reused row buffer; the state crosses
  * the driver in the totals collect like the sum states (UTF8String /
  * Decimal / boxed primitives are all serializable).
  */
private[plans] final class MaxAcc(inType: DataType) extends CumAcc {
  private val ordering =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(inType)
  private var acc: Any = null
  def add(row: InternalRow, i: Int): Unit =
    if (!row.isNullAt(i)) {
      val v = row.get(i, inType)
      if (acc == null || ordering.compare(v, acc) > 0)
        acc = InternalRow.copyValue(v)
    }
  def merge(state: Any): Unit =
    if (state != null && (acc == null || ordering.compare(state, acc) > 0))
      acc = state
  def state: Any = acc
  def emit(outType: DataType): Any = acc
}

private[plans] final class DecimalAcc(p: Int, s: Int) extends CumAcc {
  private var acc: java.math.BigDecimal = null
  def add(row: InternalRow, i: Int): Unit =
    if (!row.isNullAt(i)) {
      val v = row.getDecimal(i, p, s).toJavaBigDecimal
      acc = if (acc == null) v else acc.add(v)
    }
  def merge(state: Any): Unit = state match {
    case null => ()
    case bd: java.math.BigDecimal =>
      acc = if (acc == null) bd else acc.add(bd)
  }
  def state: Any = acc
  def emit(outType: DataType): Any =
    if (acc == null) null
    else {
      val odt = outType.asInstanceOf[DecimalType]
      val d = Decimal(acc)
      if (!d.changePrecision(odt.precision, odt.scale))
        throw new ArithmeticException(
          s"cumsum overflow: $acc does not fit $odt")
      d
    }
}
