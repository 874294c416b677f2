package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global cumulative sum.
  *
  * `Window.orderBy(...)` with no partition moves the whole input to a
  * single task — correct, but a flat-line on a cluster. This is the
  * scale-safe two-pass prefix sum instead:
  *
  *   1. range-partition by the sort keys (global order across
  *      partitions, local sort within);
  *   2. per-partition local cumulative sum (window partitioned by the
  *      physical partition id — every task works in parallel);
  *   3. per-partition totals → exclusive running offsets (at most one
  *      row per partition, computed on the driver — bounded by the
  *      partition count, not the data);
  *   4. broadcast the offsets back and add to the local cumsum.
  *
  * The value expression's type is preserved (pass a DECIMAL cast for
  * exact, order-independent totals — see [[Cols]]).
  */
object PrefixSum {

  /** df with column `out` = running sum of `value` over rows globally
    * ordered by `sortKeys` (ties must be broken by the keys for a
    * deterministic result).
    */
  def globalCumsum(df: DataFrame, sortKeys: Seq[Column], value: Column,
      out: String, partitions: Int = 32): DataFrame = {
    val pidCol = "__cumsum_pid"
    val localCol = "__cumsum_local"
    val offsetCol = "__cumsum_offset"

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
    val local = ranged.withColumn(localCol, sum(value).over(wLocal))

    // offsets: partition totals → exclusive prefix. One row per
    // partition — the collect is bounded by `partitions`, not data.
    // (Totals are summed directly, not taken from the cumsum column,
    // so negative values are handled.)
    val totals = ranged.groupBy(col(pidCol))
      .agg(sum(value).as("__total"))
      .orderBy(col(pidCol))
      .collect()
    val spark = df.sparkSession
    var running: Any = null
    val offsets = totals.map { r =>
      val pid = r.getInt(0)
      val off = running
      val total = r.get(1)
      running = (running, total) match {
        case (null, t) => t
        case (r0, null) => r0
        case (a: java.math.BigDecimal, b: java.math.BigDecimal) => a.add(b)
        case (a: Double, b: Double) => a + b
        case (a: Long, b: Long) => a + b
        case (a, b) => sys.error(s"unsupported cumsum type: $a + $b")
      }
      (pid, off)
    }

    import scala.jdk.CollectionConverters._
    val valueType = local.schema(localCol).dataType
    val offsetSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(pidCol,
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField(offsetCol, valueType)))
    val offsetRows = offsets.map { case (pid, off) =>
      org.apache.spark.sql.Row(pid,
        off match {
          case bd: java.math.BigDecimal => new java.math.BigDecimal(bd.toString)
          case other => other
        })
    }.toSeq
    val offsetDf = spark.createDataFrame(offsetRows.asJava, offsetSchema)

    local
      .join(broadcast(offsetDf), Seq(pidCol), "left")
      .withColumn(out,
        when(col(offsetCol).isNull, col(localCol))
          .otherwise(col(localCol) + col(offsetCol)))
      .drop(pidCol, localCol, offsetCol)
  }
}
