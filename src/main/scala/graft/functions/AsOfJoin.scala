package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join (point-in-time join): every probe
  * row picks up the payload of the build row with the GREATEST build
  * time ≤ its probe time, per key — the rates-to-trades /
  * features-to-labels temporal join Spark has no native operator for.
  *
  * Implementation is the scale-correct merge formulation, not a
  * per-probe-row subquery: both sides union into one stream tagged so
  * build rows sort immediately BEFORE probe rows at equal timestamps
  * (≤ semantics), then one per-key ordered window forward-fills the
  * latest payload onto each probe row. Cost = one shuffle on the key
  * + one local sort per partition — same shape as a sort-merge join,
  * no range explosion, no driver loops. Keys partition uniformly when
  * the key is an entity id; a single pathological key serializes its
  * own rows only (and can be time-bucketed two-pass like [[PrefixSum]]
  * if ever needed).
  *
  * The build side must be unique per (key, time) — pre-aggregate it
  * (e.g. max_by of the tiebreak column) so "latest at t" is
  * well-defined; uniqueness makes the result independent of input
  * order, matching DuckDB's ASOF JOIN semantics for the oracle.
  */
object AsOfJoin {

  /** The tagged union both formulations fill over: build rows sort
    * immediately before probe rows at equal timestamps (≤ semantics).
    */
  private def taggedUnion(probe: DataFrame, probeKey: String,
      probeTime: String, build: DataFrame, buildKey: String,
      buildTime: String, payload: Seq[String]): DataFrame = {
    val probeStruct = struct(probe.columns.map(col): _*)
    val payloadStruct = struct(payload.map(col): _*)
    val probeType = probe.select(probeStruct.as("s")).schema("s").dataType
    val payloadType = build.select(payloadStruct.as("s")).schema("s").dataType

    val b = build.select(
      col(buildKey).as("__k"), col(buildTime).as("__t"),
      lit(0).as("__side"),
      lit(null).cast(probeType).as("__probe"),
      payloadStruct.as("__pl"))
    val p = probe.select(
      col(probeKey).as("__k"), col(probeTime).as("__t"),
      lit(1).as("__side"),
      probeStruct.as("__probe"),
      lit(null).cast(payloadType).as("__pl"))
    b.unionByName(p)
  }

  private def project(filled: DataFrame, probe: DataFrame,
      payload: Seq[String], fill: String): DataFrame = {
    val probeCols = probe.columns.map(c => col(s"__probe.$c").as(c))
    val payloadCols = payload.map(c => col(s"$fill.$c").as(c))
    filled.filter(col("__side") === 1)
      .select(probeCols ++ payloadCols: _*)
  }

  /** Left-join semantics: probe rows with no earlier build row keep
    * null payloads. Output = all probe columns + `payload` columns.
    */
  def asofBackward(probe: DataFrame, probeKey: String, probeTime: String,
      build: DataFrame, buildKey: String, buildTime: String,
      payload: Seq[String]): DataFrame =
    asofFill(probe, probeKey, probeTime, build, buildKey, buildTime,
      payload, descending = false)

  /** Forward variant: every probe row picks up the build row with the
    * SMALLEST build time ≥ its probe time per key (next-quote /
    * next-event semantics). Identical machinery scanned in reverse:
    * the merge order is time-descending, so the forward fill carries
    * the nearest at-or-after payload instead. Same single key shuffle.
    */
  def asofForward(probe: DataFrame, probeKey: String, probeTime: String,
      build: DataFrame, buildKey: String, buildTime: String,
      payload: Seq[String]): DataFrame =
    asofFill(probe, probeKey, probeTime, build, buildKey, buildTime,
      payload, descending = true)

  private def asofFill(probe: DataFrame, probeKey: String,
      probeTime: String, build: DataFrame, buildKey: String,
      buildTime: String, payload: Seq[String], descending: Boolean)
      : DataFrame = {
    // build-before-probe at equal __t ⇒ fills are inclusive ("≤" for
    // the backward scan, "≥" for the forward/descending scan)
    val w = Window.partitionBy(col("__k"))
      .orderBy(if (descending) col("__t").desc else col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled =
      taggedUnion(probe, probeKey, probeTime, build, buildKey, buildTime,
        payload)
        .withColumn("__fill", last(col("__pl"), ignoreNulls = true).over(w))
    project(filled, probe, payload, "__fill")
  }

  /** Skew-proof variant: identical semantics to [[asofBackward]], but
    * no per-key window over the raw rows — a single pathological key
    * (one currency, one global feed) cannot serialize into one task.
    *
    * Same two-pass shape as [[PrefixSum]]:
    *   1. range-partition the tagged union on (key, time, side) —
    *      global order, a hot key spans many partitions;
    *   2. forward-fill locally per (partition, key) — every task in
    *      parallel, no cross-partition dependency;
    *   3. per-(partition, key) latest build payload → per-key carry-in
    *      from earlier partitions. The carry table is bounded by the
    *      number of PARTITION BOUNDARIES a key crosses (≤ partitions),
    *      not by data — so it broadcasts;
    *   4. coalesce(local fill, carry-in).
    *
    * The step-3 window runs over the per-(partition, key) aggregate
    * (≤ keys + partitions rows, one tiny row each), the exact analogue
    * of PrefixSum's driver-side offsets.
    */
  def asofBackwardBucketed(probe: DataFrame, probeKey: String,
      probeTime: String, build: DataFrame, buildKey: String,
      buildTime: String, payload: Seq[String],
      partitions: Int = 32): DataFrame = {
    val (plan, ranged) = asofBackwardBucketedPlan(probe, probeKey,
      probeTime, build, buildKey, buildTime, payload, partitions)
    val out = Materialize.stable(plan)
    ranged.unpersist()
    out
  }

  /** The un-materialized bucketed plan plus its pinned range cache —
    * split out so tests can inspect the physical plan before
    * [[Materialize.stable]] truncates the lineage. Callers must
    * unpersist the returned cache once done.
    */
  private[graft] def asofBackwardBucketedPlan(probe: DataFrame,
      probeKey: String, probeTime: String, build: DataFrame,
      buildKey: String, buildTime: String, payload: Seq[String],
      partitions: Int): (DataFrame, DataFrame) = {
    // Persisted for the same reason as PrefixSum: the carry pass and
    // the final plan must see the SAME range-partition assignment.
    val ranged =
      taggedUnion(probe, probeKey, probeTime, build, buildKey, buildTime,
        payload)
        .repartitionByRange(partitions, col("__k"), col("__t"), col("__side"))
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val wLocal = Window.partitionBy(col("__pid"), col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged
      .withColumn("__fill", last(col("__pl"), ignoreNulls = true).over(wLocal))

    // latest build payload per (partition, key); null when a partition
    // holds only probe rows for the key
    val perBucket = ranged
      .groupBy(col("__pid"), col("__k"))
      .agg(max_by(when(col("__side") === 0, col("__pl")),
        when(col("__side") === 0, col("__t"))).as("__last"))
    // carry-in = latest build payload from any EARLIER partition of the
    // same key; non-null only where a key crosses a partition boundary
    // with build history behind it, so ≤ `partitions` rows survive
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perBucket
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry))
      .filter(col("__carry").isNotNull)
      .select(col("__pid"), col("__k"), col("__carry"))

    val filled = local
      .join(broadcast(carry), Seq("__pid", "__k"), "left")
      .withColumn("__fill", coalesce(col("__fill"), col("__carry")))
    (project(filled, probe, payload, "__fill"), ranged)
  }
}
