package graft.xrpl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MmrSelect

/** The MMR greedy must equal a direct Scala reference implementation
  * (same λ/μ, same cosine chain, same vid tie-break) on random pools,
  * and must visibly diversify: a pool of near-duplicates plus one
  * dissimilar low-relevance outlier must pick the outlier second.
  */
class MmrSelectSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val lam = 0.7
  private val mu = 0.3

  private def reference(cands: Seq[(Long, Double, Seq[Long])], k: Int)
      : Seq[(Long, Int, Double)] = {
    val sq = cands.map(c => math.sqrt(c._3.map(x => x * x).sum.toDouble))
    def cos(i: Int, j: Int): Double = {
      val dot = cands(i)._3.zip(cands(j)._3).map { case (a, b) => a * b }.sum
      dot.toDouble / (sq(i) * sq(j))
    }
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    while (picked.size < math.min(k, cands.size)) {
      val remaining = cands.indices.filterNot(i => picked.exists(_._1 == i))
      val scored = remaining.map { i =>
        val ms =
          if (picked.isEmpty) 0.0 else picked.map(p => cos(i, p._1)).max
        (i, lam * cands(i)._2 - mu * ms)
      }
      val best = scored.minBy { case (i, s) => (-s, cands(i)._1) }
      picked += best
    }
    picked.zipWithIndex.map { case ((i, s), r) =>
      (cands(i)._1, r + 1, s)
    }.toSeq
  }

  private def run(cands: Seq[(Long, Double, Seq[Long])], k: Int)
      : Seq[(Long, Int, Double)] = {
    import spark.implicits._
    cands.toDF("vid", "rel", "qv")
      .withColumn("norm2",
        expr("aggregate(qv, 0L, (a, x) -> a + x * x)"))
      .agg(collect_list(struct(col("vid"), col("rel"), col("qv"),
        col("norm2"))).as("cands"))
      .select(explode(MmrSelect.mmr_select(col("cands"), k, lam, mu))
        .as("m"))
      .select(col("m.vid"), col("m.mmr_rank"), col("m.score"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sortBy(_._2)
  }

  test("matches the Scala reference greedy on random pools") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(5)
      val cands = Seq.tabulate(n) { i =>
        (i.toLong, rnd.nextDouble() * 2 - 1,
          Seq.fill(8)((rnd.nextInt(2000001) - 1000000).toLong))
      }
      assert(run(cands, 5) === reference(cands, 5), s"trial $trial")
    }
  }

  test("diversifies: picks the dissimilar outlier over a clone") {
    // three near-identical high-relevance vectors + one orthogonal
    // low-relevance outlier: pure relevance ranks the outlier last,
    // MMR picks it SECOND (the clones' mutual cos ≈ 1 costs them μ)
    val clone = Seq(1000000L, 1000000L, 0L, 0L)
    val cands = Seq(
      (1L, 0.9, clone),
      (2L, 0.89, clone),
      (3L, 0.88, clone),
      (4L, 0.5, Seq(0L, 0L, 1000000L, 1000000L)))
    val got = run(cands, 3).map(_._1)
    assert(got === Seq(1L, 4L, 2L))
  }

  test("caps at pool size and ranks 1..n") {
    val cands = Seq(
      (7L, 0.3, Seq(1000000L, 0L)),
      (9L, 0.2, Seq(0L, 1000000L)))
    val got = run(cands, 5)
    assert(got.map(_._2) === Seq(1, 2))
    assert(got.map(_._1) === Seq(7L, 9L))
  }
}
