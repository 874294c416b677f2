package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier, maximizing both
  * dimensions): the rows no other row dominates, where `d` dominates
  * `r` iff d.x ≥ r.x ∧ d.y ≥ r.y with at least one strict.
  *
  * The textbook formulation is a quadratic NOT EXISTS self-join (the
  * DuckDB oracle keeps it). The scale shape used here is the classic
  * sort-scan: a row survives iff its y strictly exceeds the maximum y
  * over all rows of strictly greater x, and no same-x row has greater
  * y. That prefix-max over x-descending order is computed with the
  * same two-pass trick as [[PrefixSum]] — range partition on x, local
  * running max per partition, per-partition maxima collected to the
  * driver (bounded by the partition count, not the data) and
  * broadcast back as exclusive carries — so no global single-task
  * window exists at any input size. Total cost: one hash aggregate
  * (max y per x), one range shuffle, one broadcast join back.
  */
object ParetoFront {

  /** Rows of `df` on the maximize-(x, y) Pareto frontier. Duplicate
    * frontier points all survive (they are mutually incomparable).
    * x and y must be orderable scalar columns (numeric / date /
    * timestamp / string).
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
      partitions: Int = 32): DataFrame = {
    // one candidate row per x: only the max-y row of an x-group can
    // be on the frontier (same x, smaller y ⇒ dominated)
    val xg = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__ym"))

    // Persisted for the same reason as PrefixSum: the carry pass and
    // the final plan must see the SAME range-partition assignment.
    val ranged = xg
      .repartitionByRange(partitions, col(xCol).desc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // local pass: exclusive running max of y over higher-x rows of
    // the same partition (x is unique per row after the group-by, so
    // "previous rows" = "strictly greater x")
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__prev_local", max(col("__ym")).over(wLocal))

    // carry pass: per-partition max y → exclusive prefix max from all
    // earlier (higher-x) partitions. ≤ `partitions` rows — computed on
    // the driver exactly like PrefixSum's offsets.
    val perPid = ranged.groupBy(col("__pid")).agg(max(col("__ym")).as("__pmax"))
      .orderBy(col("__pid"))
      .collect()
    val spark = df.sparkSession
    val carryRows = {
      var best: Any = null
      perPid.map { r =>
        val row = org.apache.spark.sql.Row(r.get(0), best)
        val pm = r.get(1)
        if (best == null ||
            (pm != null &&
              pm.asInstanceOf[Comparable[Any]].compareTo(best) > 0))
          best = pm
        row
      }.toSeq
    }
    val carrySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("__carry",
        xg.schema("__ym").dataType)))
    val carry = spark.createDataFrame(
      spark.sparkContext.parallelize(carryRows, 1), carrySchema)

    val surv = local
      .join(broadcast(carry), Seq("__pid"), "left")
      .withColumn("__prev", greatest(col("__prev_local"), col("__carry")))
      .filter(col("__prev").isNull || col("__ym") > col("__prev"))
      .select(col(xCol).as("__sx"), col("__ym"))

    // join back: every original row at a surviving (x, max-y) point
    val out = Materialize.stable(
      df.join(broadcast(surv),
        col(xCol) === col("__sx") && col(yCol) === col("__ym"))
        .drop("__sx", "__ym"))
    ranged.unpersist()
    out
  }
}
