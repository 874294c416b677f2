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

  /** Left-join semantics: probe rows with no earlier build row keep
    * null payloads. Output = all probe columns + `payload` columns.
    */
  def asofBackward(probe: DataFrame, probeKey: String, probeTime: String,
      build: DataFrame, buildKey: String, buildTime: String,
      payload: Seq[String]): DataFrame = {
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

    // build-before-probe at equal __t ⇒ fills implement "≤", not "<"
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = b.unionByName(p)
      .withColumn("__fill", last(col("__pl"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val probeCols = probe.columns.map(c => col(s"__probe.$c").as(c))
    val payloadCols = payload.map(c => col(s"__fill.$c").as(c))
    filled.select(probeCols ++ payloadCols: _*)
  }
}
