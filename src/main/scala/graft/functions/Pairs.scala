package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable all-pairs generation within groups.
  *
  * A plain self-join on the group key computes C(n, 2) pairs of the
  * hottest group in ONE task — the classic quadratic blow-up of
  * similarity/dedup pair generation. The triangle block decomposition
  * splits each group's members into blocks and joins on
  * (group, block-i, block-j) with i ≤ j:
  *
  *   - complete: every unordered pair lands in exactly one block pair
  *     (the smaller-block member on the `a` side, the larger-block
  *     member on the `b` side; same-block pairs de-duplicated by id);
  *   - bounded: the worst task computes ~blockSize² pairs, however
  *     large the group;
  *   - degenerate-free: groups that fit one block reduce to exactly
  *     the plain self-join plan.
  *
  * Block membership is `pmod(xxhash64(id), nblocks)` with nblocks =
  * ⌈group size / blockSize⌉ from a plain hash-agg count — no
  * per-group `row_number` window, so even the hottest group's block
  * assignment is map-side parallel (the previous rank-based assignment
  * serialized each hot key through one sort task).
  */
object Pairs {

  /** All unordered same-group pairs, normalized to `a_id` < `b_id`.
    * Input needs the group `keyCols`, an orderable unique `idCol`, and
    * any `payload` columns; output carries keyCols plus `a_`/`b_`-
    * prefixed id and payload columns.
    */
  def blockedSelfPairs(df: DataFrame, keyCols: Seq[String], idCol: String,
      payload: Seq[String], blockSize: Int): DataFrame = {
    val keys = keyCols.map(col)
    // per-group block count from a hash-agg (map-side partials, no sort)
    val nblk = df.groupBy(keys: _*)
      .agg(ceil(count(lit(1)) / lit(blockSize.toDouble)).cast("int")
        .as("__nblk"))
    val blocked = df.join(broadcast(nblk), keyCols)
      .withColumn("__blk",
        pmod(xxhash64(col(idCol)), col("__nblk").cast("long")).cast("int"))

    val fields = idCol +: payload
    def tagged(prefix: String): Seq[Column] =
      keys ++ fields.map(c => col(c).as(s"${prefix}_$c"))
    // left side owns block i, partnering every j >= i; right side owns
    // block j, partnering every i <= j — a cross-block pair matches in
    // exactly one orientation (smaller block on the left)
    val a = blocked.select(tagged("a") ++ Seq(col("__blk").as("__bi"),
      explode(expr("sequence(__blk, __nblk - 1)")).as("__bj")): _*)
    val b = blocked.select(tagged("b") ++ Seq(
      explode(expr("sequence(0, __blk)")).as("__bi"),
      col("__blk").as("__bj")): _*)
    val joined = a.join(b, keyCols ++ Seq("__bi", "__bj"))
      // same-block cells would emit both orientations — keep one
      .filter(col("__bi") < col("__bj") ||
        col(s"a_$idCol") < col(s"b_$idCol"))
      .filter(col(s"a_$idCol") =!= col(s"b_$idCol"))
    // hash blocks are id-unordered, so normalize the output to
    // a_id < b_id (what the rank-ordered blocks used to guarantee)
    val lt = col(s"a_$idCol") < col(s"b_$idCol")
    val aOut = fields.map(f =>
      when(lt, col(s"a_$f")).otherwise(col(s"b_$f")).as(s"a_$f"))
    val bOut = fields.map(f =>
      when(lt, col(s"b_$f")).otherwise(col(s"a_$f")).as(s"b_$f"))
    joined.select(keys ++ aOut ++ bOut: _*)
  }
}
