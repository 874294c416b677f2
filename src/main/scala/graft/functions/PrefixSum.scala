package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Distributed global cumulative sum.
  *
  * `Window.orderBy(...)` with no partition moves the whole input to a
  * single task — correct, but a flat-line on a cluster. This is the
  * scale-safe two-pass prefix sum instead:
  *
  *   1. range-partition by the sort keys (global order across
  *      partitions, local sort within);
  *   2. per-partition local cumulative sums (window partitioned by the
  *      physical partition id — every task works in parallel);
  *   3. per-partition totals → exclusive running offsets (at most one
  *      row per partition, computed on the driver — bounded by the
  *      partition count, not the data);
  *   4. broadcast the offsets back and add to the local cumsums.
  *
  * Value expression types are preserved (pass a DECIMAL cast for
  * exact, order-independent totals — see [[Cols]]). Multiple value
  * columns cumsum in ONE pass (one range shuffle, one totals job).
  */
object PrefixSum {

  /** df with column `out` = running sum of `value` over rows globally
    * ordered by `sortKeys` (ties must be broken by the keys for a
    * deterministic result).
    */
  def globalCumsum(df: DataFrame, sortKeys: Seq[Column], value: Column,
      out: String, partitions: Int = 32): DataFrame =
    globalCumsumMulti(df, sortKeys, Seq(value -> out), partitions)

  /** Multi-column variant: every (value, outName) pair gets its own
    * running sum, sharing the single range partitioning and totals
    * pass.
    */
  def globalCumsumMulti(df: DataFrame, sortKeys: Seq[Column],
      values: Seq[(Column, String)], partitions: Int = 32): DataFrame = {
    val pidCol = "__cumsum_pid"
    def localCol(i: Int) = s"__cumsum_local_$i"
    def offsetCol(i: Int) = s"__cumsum_offset_$i"

    // Persisted: the totals job and the final plan must see the SAME
    // partition assignment, and RangePartitioner samples its bounds
    // with an RDD-id-dependent seed — two separate evaluations could
    // split differently. (At warehouse scale this stage is a write-once
    // range-partitioned table; the cache is the local analogue.)
    val ranged = df
      .repartitionByRange(partitions, sortKeys: _*)
      .withColumn(pidCol, spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // local pass: each range partition cumsums independently
    val wLocal = Window.partitionBy(col(pidCol)).orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = values.zipWithIndex.foldLeft(ranged) {
      case (acc, ((value, _), i)) =>
        acc.withColumn(localCol(i), sum(value).over(wLocal))
    }

    // offsets: partition totals → exclusive prefix. One row per
    // partition — the collect is bounded by `partitions`, not data.
    // (Totals are summed directly, not taken from the cumsum column,
    // so negative values are handled.)
    val totals = ranged.groupBy(col(pidCol))
      .agg(sum(values.head._1).as("__t0"),
        values.tail.zipWithIndex.map { case ((v, _), i) =>
          sum(v).as(s"__t${i + 1}")
        }: _*)
      .orderBy(col(pidCol))
      .collect()

    def add(a: Any, b: Any): Any = (a, b) match {
      case (null, t) => t
      case (r0, null) => r0
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
      case (x: Double, y: Double) => x + y
      case (x: Long, y: Long) => x + y
      case (x, y) => sys.error(s"unsupported cumsum type: $x + $y")
    }
    val running = Array.fill[Any](values.size)(null)
    val offsets = totals.map { r =>
      val pid = r.getInt(0)
      val off = running.clone()
      values.indices.foreach { i =>
        running(i) = add(running(i), r.get(i + 1))
      }
      (pid, off)
    }

    import scala.jdk.CollectionConverters._
    val offsetSchema = StructType(
      StructField(pidCol, IntegerType, nullable = false) +:
        values.indices.map(i =>
          StructField(offsetCol(i), local.schema(localCol(i)).dataType)))
    val offsetRows = offsets.map { case (pid, off) =>
      Row.fromSeq(pid +: off.toSeq.map {
        case bd: java.math.BigDecimal => new java.math.BigDecimal(bd.toString)
        case other => other
      })
    }.toSeq
    val offsetDf = df.sparkSession.createDataFrame(offsetRows.asJava, offsetSchema)

    val joined = local.join(broadcast(offsetDf), Seq(pidCol), "left")
    val withOuts = values.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out,
          when(col(offsetCol(i)).isNull, col(localCol(i)))
            .otherwise(col(localCol(i)) + col(offsetCol(i))))
    }
    val dropCols = pidCol +: values.indices.flatMap(i =>
      Seq(localCol(i), offsetCol(i)))
    // Eagerly materialize the result, then release the ranged cache —
    // otherwise every cumsum invocation leaks a MEMORY_AND_DISK entry
    // for the session lifetime. The checkpoint pins the partition
    // assignment the offsets were computed against, so dropping the
    // cache cannot re-sample different range bounds. Reliable vs
    // executor-local (and the fault-tolerance trade-off) is decided by
    // [[Materialize.stable]]: set a checkpoint dir at cluster scale.
    val out = Materialize.stable(withOuts.drop(dropCols: _*))
    ranged.unpersist()
    out
  }
}
