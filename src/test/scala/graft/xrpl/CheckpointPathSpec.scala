package graft.xrpl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AsOfJoin, ConnectedComponents, PrefixSum}

/** The cluster-mode branch of Materialize.stable: with a checkpoint
  * dir set, every fixpoint/two-pass operator must run through RELIABLE
  * `checkpoint(eager = true)` and produce bit-identical results to the
  * local-checkpoint path the rest of the suite exercises.
  */
class CheckpointPathSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  /** Run `body` with a reliable checkpoint dir set, restoring the
    * no-dir default afterwards so other suites keep the local path.
    */
  private def withCheckpointDir[A](body: => A): A = {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "suite expects no ambient checkpoint dir")
    val dir = Files.createTempDirectory("graft_ckpt").toString
    sc.setCheckpointDir(dir)
    try body
    finally {
      sc.setCheckpointDir(null)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("connected components agree across checkpoint modes") {
    import spark.implicits._
    // two chains and an isolated pair: multi-round propagation
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L),
      (20L, 21L)).toDF("a", "b")
    val nodes = (1L to 5L) ++ Seq(10L, 11L, 12L, 20L, 21L, 30L)
    val nodesDf = nodes.toDF("id")

    def run() = ConnectedComponents
      .minLabels(nodesDf, "id", edges, "a", "b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    val local = run()
    val reliable = withCheckpointDir { run() }
    assert(reliable === local)
    assert(local(5L) === 1L && local(12L) === 10L && local(30L) === 30L)
  }

  // The prefix-sum and as-of operators stopped routing through
  // Materialize.stable in r16/r17 (they are single custom physical
  // operators now, with no checkpoint in the path), which made the old
  // "agrees across checkpoint modes" assertions vacuous — both runs
  // exercised the identical code path (r16 ADVICE). Repurposed: each
  // operator is asserted against the STOCK unpartitioned-window oracle
  // it replaced, and the assertion still runs under both checkpoint
  // modes so an ambient checkpoint dir (the cluster default) can never
  // change operator results.

  test("prefix sum matches the unpartitioned-window oracle in both modes") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i * 7 % 13).toDouble))
      .toDF("id", "v")
    val oracle = df
      .withColumn("cum", sum(col("v")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("id"))
          .rowsBetween(Long.MinValue, 0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def run() = PrefixSum
      .globalCumsum(df, Seq(col("id")), col("v"), "cum")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    val local = run()
    val reliable = withCheckpointDir { run() }
    assert(local === oracle)
    assert(reliable === oracle)
    assert(local.size === 500)
  }

  test("as-of join matches the per-key-window oracle in both modes") {
    import spark.implicits._
    val build = Seq.tabulate(50)(i => (i.toLong % 3, i.toLong * 5, i.toDouble))
      .distinctBy(r => (r._1, r._2))
      .toDF("k", "t", "v")
    val probe = Seq.tabulate(300)(i => (i.toLong, i.toLong % 4, i.toLong))
    val oracle = probe.map { case (id, k, t) =>
      id -> Seq.tabulate(50)(i => (i.toLong % 3, i.toLong * 5, i.toDouble))
        .distinctBy(r => (r._1, r._2))
        .filter(b => b._1 == k && b._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    def run() = AsOfJoin
      .asofBackwardBucketed(probe.toDF("id", "k", "t"), "k", "t",
        build, "k", "t", Seq("v"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    val local = run()
    val reliable = withCheckpointDir { run() }
    assert(local === oracle)
    assert(reliable === oracle)
    assert(local.size === 300)
  }
}
