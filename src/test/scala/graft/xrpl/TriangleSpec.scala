package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterOps

/** Degree-ordered triangle enumeration must agree with the naive
  * definition (number of neighbor pairs that interlink) on arbitrary
  * graphs — including hubs, isolated nodes, and duplicate-free ties.
  */
class TriangleSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def naive(n: Int, edges: Set[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    (0L until n).map { x =>
      val nb = adj.getOrElse(x, Set.empty).toSeq
      x -> nb.combinations(2).count {
        case Seq(a, b) =>
          edges(if (a < b) (a, b) else (b, a))
      }.toLong
    }.toMap
  }

  test("fixture: hub + triangle + isolated node") {
    import spark.implicits._
    // 0-1-2 is a triangle; 3 is a hub touching 0,1,2 (three more
    // triangles through 3); 4 is isolated
    val edges = Set((0L, 1L), (0L, 2L), (1L, 2L),
      (0L, 3L), (1L, 3L), (2L, 3L))
    val got = ClusterOps.triangleCountsOf(
        (0L until 5L).toDF("vec_id"),
        edges.toSeq.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 0L))
    assert(got === naive(5, edges))
  }

  test("matches the naive count on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (for {
        u <- 0L until n
        v <- (u + 1) until n
        if rnd.nextDouble() < 0.15
      } yield (u, v)).toSet
      val got = ClusterOps.triangleCountsOf(
          (0L until n).toDF("vec_id"),
          edges.toSeq.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === naive(n.toInt, edges), s"trial=$trial")
    }
  }
}
