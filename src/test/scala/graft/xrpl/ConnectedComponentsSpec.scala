package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ConnectedComponents

/** Min-label propagation must assign every node the minimum id of its
  * component, for shallow clique-ish graphs (the near-dup shape) and
  * for chains that force multiple propagation rounds.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.minLabels(
        nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle, pair, and isolated nodes resolve to component minima") {
    val got = run(
      nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      edges = Seq((2L, 1L), (2L, 3L), (1L, 3L), (6L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("a long chain converges across multiple rounds") {
    val n = 24L
    val got = run(
      nodes = (1L to n),
      edges = (1L until n).map(i => (i + 1, i)))
    assert(got === (1L to n).map(_ -> 1L).toMap)
  }

  test("edge orientation is irrelevant and no edges means self labels") {
    val forward = run(Seq(1L, 2L, 3L), Seq((1L, 3L)))
    val backward = run(Seq(1L, 2L, 3L), Seq((3L, 1L)))
    assert(forward === backward)
    assert(run(Seq(9L, 8L), Seq.empty[(Long, Long)]) === Map(9L -> 9L, 8L -> 8L))
  }
}
