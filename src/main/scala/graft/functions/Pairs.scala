package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable all-pairs generation within groups.
  *
  * A plain self-join on the group key computes C(n, 2) pairs of the
  * hottest group in ONE task — the classic quadratic blow-up of
  * similarity/dedup pair generation. The triangle block decomposition
  * splits each group's members into id-ordered blocks of `blockSize`
  * and joins on (group, block-i, block-j) with i ≤ j:
  *
  *   - complete: every pair lands in exactly one block pair (ids in
  *     block i precede ids in block j for i < j, and the i = j case is
  *     filtered to a_id < b_id);
  *   - bounded: the worst task computes blockSize² pairs, however
  *     large the group;
  *   - degenerate-free: groups that fit one block reduce to exactly
  *     the plain self-join plan.
  */
object Pairs {

  /** All unordered same-group pairs (`a_id` < `b_id`). Input needs the
    * group `keyCols`, an orderable numeric `idCol`, and any `payload`
    * columns; output carries keyCols plus `a_`/`b_`-prefixed id and
    * payload columns.
    */
  def blockedSelfPairs(df: DataFrame, keyCols: Seq[String], idCol: String,
      payload: Seq[String], blockSize: Int): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(idCol))
    val blocked = df
      .withColumn("__blk",
        floor((row_number().over(w) - 1) / blockSize).cast("int"))
    val nblk = blocked.groupBy(keys: _*).agg(max(col("__blk")).as("__max_blk"))

    def side(prefix: String, partners: Column): DataFrame = {
      val cols = keys ++
        Seq(col(idCol).as(s"${prefix}_$idCol")) ++
        payload.map(c => col(c).as(s"${prefix}_$c")) ++
        Seq(col("__blk"), partners)
      (if (prefix == "a") blocked.join(broadcast(nblk), keyCols) else blocked)
        .select(cols: _*)
    }
    // left side owns block i, partnering every j >= i; right side owns
    // block j, partnering every i <= j
    val a = side("a", explode(expr("sequence(__blk, __max_blk)")).as("__bj"))
      .withColumnRenamed("__blk", "__bi")
    val b = side("b", explode(expr("sequence(0, __blk)")).as("__bi"))
      .withColumnRenamed("__blk", "__bj")
    a.join(b, keyCols ++ Seq("__bi", "__bj"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .drop("__bi", "__bj")
  }
}
