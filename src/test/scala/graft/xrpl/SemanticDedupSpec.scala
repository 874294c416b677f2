package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterOps

/** Semantic-dedup invariants, checked against a brute-force in-memory
  * reimplementation on the small fixture — the oracle gate proves
  * cross-engine equality; this spec pins the SEMANTICS (greedy
  * keep-first inside a cluster at τ = 0.3) so a refactor that passed
  * some other relation through both engines would still fail.
  */
class SemanticDedupSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("dup_of is an earlier same-cluster neighbor above the threshold") {
    val out = ClusterOps.semanticDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    assert(out.nonEmpty)

    // independent reimplementation from the raw embeddings
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val cid = out.map(t => t._1 -> t._2).toMap
    def dot(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    def similar(i: Long, j: Long): Boolean = {
      val d = dot(emb(i), emb(j))
      d > 0 && 100 * d * d >= 9 * dot(emb(i), emb(i)) * dot(emb(j), emb(j))
    }

    for ((i, c, dupOf, keep) <- out) {
      assert(keep === dupOf.isEmpty, s"vec $i: keep flag mismatch")
      // expected dup_of: the SMALLEST earlier same-cluster similar id
      val expect = out.iterator
        .map(_._1).filter(j => j < i && cid(j) == c && similar(i, j))
        .reduceOption(_ min _)
      assert(dupOf === expect, s"vec $i in cluster $c")
    }
    // non-vacuous both ways
    assert(out.exists(_._4) && out.exists(!_._4))
  }
}
