package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RangeJoin

/** Bucketed point-in-interval join: exact half-open semantics at
  * bucket boundaries and no duplicate pairs across buckets.
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("boundary and multi-bucket intervals match the naive join") {
    import spark.implicits._
    // bucket width 10: intervals deliberately span 1-4 buckets and
    // start/end exactly ON bucket edges
    val intervals = Seq(
      (1L, "a", 0L, 10L),   // exactly one bucket
      (2L, "a", 5L, 25L),   // spans 3 buckets
      (3L, "a", 10L, 20L),  // aligned to edges
      (4L, "b", 7L, 8L),    // sub-bucket
      (5L, "a", 38L, 39L)
    ).toDF("iv_id", "key", "t0", "t1")
    val points = Seq(
      (100L, "a", 0L), (101L, "a", 5L), (102L, "a", 9L),
      (103L, "a", 10L), (104L, "a", 19L), (105L, "a", 20L),
      (106L, "a", 24L), (107L, "a", 25L), (108L, "b", 7L),
      (109L, "b", 8L), (110L, "a", 38L)
    ).toDF("p_id", "key", "t")

    val got = RangeJoin.pointInInterval(
        intervals, "key", "t0", "t1", points, "key", "t", bucketUs = 10L)
      .select($"i_iv_id", $"p_p_id").as[(Long, Long)].collect().toSet

    val naive = intervals.as("i").join(points.as("p"),
        $"i.key" === $"p.key" && $"p.t" >= $"i.t0" && $"p.t" < $"i.t1")
      .select($"i.iv_id", $"p.p_id").as[(Long, Long)].collect().toSet

    assert(got === naive)
    // spot-check half-open edges: t=10 is IN [10,20) and OUT of [0,10)
    assert(got.contains((3L, 103L)) && !got.contains((1L, 103L)))
    // multi-bucket interval caught points in every covered bucket
    assert(Set((2L, 101L), (2L, 104L), (2L, 106L)).subsetOf(got))
    assert(!got.contains((2L, 107L))) // t=25 excluded (half-open)
    // no duplicates: the DataFrame itself must be duplicate-free
    val df = RangeJoin.pointInInterval(
      intervals, "key", "t0", "t1", points, "key", "t", bucketUs = 10L)
    assert(df.count() === df.distinct().count())
  }
}
