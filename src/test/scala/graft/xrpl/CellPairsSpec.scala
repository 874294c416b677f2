package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** The triangle block decomposition must produce EXACTLY the pair set
  * of the plain same-cell self-join — complete and duplicate-free —
  * for any block size, including block sizes that split cells.
  */
class CellPairsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def sig() = {
    import spark.implicits._
    // 2 cells: 11 and 7 vectors — several blocks at blockSize 3
    val rows = (0 until 18).map { i =>
      (i.toLong, if (i < 11) "cellA" else "cellB",
        Array(i.toLong, (i * 7 % 13).toLong), (i * i).toLong)
    }
    rows.toDF("vec_id", "label", "qv", "norm2")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("decomposed pairs equal the naive self-join for every block size") {
    val s = sig()
    val a = s.select(col("label"), col("vec_id").as("a_id"))
    val b = s.select(col("label").as("b_label"), col("vec_id").as("b_id"))
    val naive = a.join(b, col("label") === col("b_label") &&
        col("a_id") < col("b_id"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.size === 11 * 10 / 2 + 7 * 6 / 2)
    Seq(1, 2, 3, 5, 100).foreach { bs =>
      val got = pairsOf(SimilarityOps.cellPairs(s, bs))
      assert(got === naive, s"blockSize=$bs")
    }
  }

  test("duplicate-free: one row per pair even across blocks") {
    val got = SimilarityOps.cellPairs(sig(), 2)
      .groupBy("a_id", "b_id").count().filter(col("count") > 1).count()
    assert(got === 0L)
  }

  test("hash block assignment plans no per-key Window sort") {
    import spark.implicits._
    val df = (0 until 18).map(i => (i.toLong, s"cell${i % 2}", i * 2L))
      .toDF("vec_id", "label", "payload")
    val plan = graft.functions.Pairs
      .blockedSelfPairs(df, Seq("label"), "vec_id", Seq("payload"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.linesIterator.take(20).mkString("\n"))
  }

  test("shared signature cache builds window- and shuffle-free") {
    // The most-shared cache in the suite (feeds ~10 gates): its build
    // must be a pure per-row map over the parquet scan — a per-cell
    // rank would serialize a hot cell through one WindowExec task
    // during materialization, for a column nothing consumes.
    val plan = SimilarityOps.signatures(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.linesIterator.take(20).mkString("\n"))
    assert(!plan.contains("Exchange"), plan.linesIterator.take(20).mkString("\n"))
  }
}
