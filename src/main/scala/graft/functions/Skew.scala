package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (the brief's "salting for skew").
  *
  * At 100 TB a handful of hot accounts/pairs dominate shuffle
  * partitions (one reducer gets the whale account's billion rows). A
  * salted join spreads each hot key over `factor` sub-partitions:
  * the skewed (fact) side gets a random salt in [0, factor); the
  * small/replicated (dim) side is exploded across all salts. The join
  * key becomes (key, salt), so the hot key's rows land on `factor`
  * reducers instead of one.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles
  * many cases at runtime; explicit salting is for aggregations and
  * joins AQE can't split (e.g. bucketed sides, stateful streaming).
  */
object Skew {

  /** Add a uniform salt column to the skewed side, derived from a hash
    * of `saltKeys` (typically row-identifying columns): unlike
    * rand(seed) — whose values depend on the physical partition layout
    * — the salt is a pure row function, so retries, re-runs and
    * re-partitioned inputs salt every row identically.
    */
  def salted(df: DataFrame, factor: Int, saltCol: String = "__salt",
      saltKeys: Seq[Column] = Nil): DataFrame = {
    val basis =
      if (saltKeys.nonEmpty) saltKeys
      else df.columns.toSeq.map(col)
    df.withColumn(saltCol, pmod(hash(basis: _*), lit(factor)))
  }

  /** Replicate the dimension side across every salt value. */
  def replicated(dim: DataFrame, factor: Int, saltCol: String = "__salt"): DataFrame =
    dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(factor - 1))))

  /** Skew-safe equi-join: fact ⨝ dim on (keys..., salt). Result equals
    * the plain join — the salt only spreads the shuffle.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    val saltCol = "__salt"
    salted(fact, factor, saltCol)
      .join(replicated(dim, factor, saltCol), keys :+ saltCol)
      .drop(saltCol)
  }

  /** Two-phase (salted partial → final) aggregation for skewed group
    * keys: count/sum-style aggregates compute per (key, salt) first —
    * spreading the hot key — then combine. `aggs` must be algebraic
    * (sum/count/min/max).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], factor: Int,
      partial: Seq[(String, Column)], combine: Seq[Column]): DataFrame = {
    val saltCol = "__salt"
    val phase1 = salted(df, factor, saltCol)
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }
}
