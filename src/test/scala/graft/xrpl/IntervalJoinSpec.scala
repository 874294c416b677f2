package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IntervalJoin

/** The bucketed interval-overlap join must produce EXACTLY the pair
  * BAG of the naive theta-join — complete (a pair spanning many
  * buckets still meets), duplicate-free (a pair meeting in several
  * buckets appears once), and multiplicity-preserving (exact-duplicate
  * input rows yield duplicate pairs, not a collapsed set) — for any
  * bucket width.
  */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  // Deterministic pseudo-random intervals: lengths from sub-bucket to
  // many-bucket so every fan-out regime is exercised.
  private def intervals(n: Int, seed: Int, idCol: String,
      sCol: String, eCol: String) = {
    import spark.implicits._
    (0 until n).map { i =>
      val start = ((i * 7919L + seed * 104729L) % 1000L) * 10L
      val len = (i * 31L + seed * 17L) % 350L
      (i.toLong, start, start + len)
    }.toDF(idCol, sCol, eCol)
  }

  test("bucketed overlap equals the naive theta-join for every bucket width") {
    val a = intervals(60, 1, "a_id", "a_s", "a_e")
    val b = intervals(45, 2, "b_id", "b_s", "b_e")
    val naive = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    Seq(1L, 7L, 100L, 1000L, 100000L).foreach { w =>
      val got = IntervalJoin
        .overlap(a, b, "a_s", "a_e", "b_s", "b_e", bucketWidth = w)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"bucketWidth=$w")
    }
  }

  test("duplicate-free even when pairs meet in many buckets") {
    val a = intervals(30, 3, "a_id", "a_s", "a_e")
    val b = intervals(30, 4, "b_id", "b_s", "b_e")
    val dupes = IntervalJoin
      .overlap(a, b, "a_s", "a_e", "b_s", "b_e", bucketWidth = 5L)
      .groupBy("a_id", "b_id").count().filter(col("count") > 1).count()
    assert(dupes === 0L)
  }

  test("duplicate input rows keep theta-join multiplicity (bag semantics)") {
    // Owning-bucket emission must not collapse genuinely duplicate
    // input rows the way a trailing distinct() would: 2 identical left
    // rows x 3 identical right rows = 6 pairs, across bucket widths
    // that place the pair in one or many shared buckets.
    import spark.implicits._
    val a = Seq((1L, 0L, 100L), (1L, 0L, 100L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((9L, 50L, 260L), (9L, 50L, 260L), (9L, 50L, 260L))
      .toDF("b_id", "b_s", "b_e")
    Seq(7L, 100L, 1000L).foreach { w =>
      val rows = IntervalJoin
        .overlap(a, b, "a_s", "a_e", "b_s", "b_e", bucketWidth = w)
        .collect()
      assert(rows.length === 6, s"bucketWidth=$w")
    }
  }

  test("touching endpoints count as overlap") {
    import spark.implicits._
    val a = Seq((1L, 0L, 100L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((2L, 100L, 200L), (3L, 101L, 200L)).toDF("b_id", "b_s", "b_e")
    val got = IntervalJoin
      .overlap(a, b, "a_s", "a_e", "b_s", "b_e", bucketWidth = 50L)
      .select("b_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  test("the join is a hash equi-join on the bucket key, not a cartesian") {
    val a = intervals(20, 5, "a_id", "a_s", "a_e")
    val b = intervals(20, 6, "b_id", "b_s", "b_e")
    val plan = IntervalJoin
      .overlap(a, b, "a_s", "a_e", "b_s", "b_e", bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
