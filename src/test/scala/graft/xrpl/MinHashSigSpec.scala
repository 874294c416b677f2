package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashSig

/** The codegen'd MinHashSig expression must produce exactly the
  * signature of the declarative formulation it replaces:
  * m_i = min over shingles s of substr(md5(i/4 || s), (i%4)*8+1, 8).
  */
class MinHashSigSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val n = 6 // spans two md5 groups

  private def declarative(df: org.apache.spark.sql.DataFrame) = {
    val shingles = df
      .filter(length(col("text")) >= 8)
      .select(col("id"),
        explode(expr(
          "transform(sequence(1, length(text)-7), i -> substring(text, i, 8))")).as("s"))
    val aggs = (0 until n).map { i =>
      val digest = md5(concat(lit((i / 4).toString), col("s")))
      min(substring(digest, (i % 4) * 8 + 1, 8)).as(s"m$i")
    }
    shingles.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  private def viaExpression(df: org.apache.spark.sql.DataFrame) = {
    val mSel = (0 until n).map(i => col("sig").getItem(i).as(s"m$i"))
    df.filter(length(col("text")) >= 8)
      .select(col("id") +: MinHashSig.minhash_sig(col("text"), n).as("sig") +: Nil: _*)
      .select(col("id") +: mSel: _*)
  }

  test("expression equals explode+groupBy-min signature") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", // degenerate: one distinct shingle
      "12345678", // exactly one shingle
      "short", // below shingle width — filtered by both plans
      "Pack my box with five dozen liquor jugs; amazingly few discotheques provide jukeboxes.")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val a = declarative(texts).collect()
      .map(r => r.getLong(0) -> (1 until 1 + n).map(r.getString).toVector).toMap
    val b = viaExpression(texts).collect()
      .map(r => r.getLong(0) -> (1 until 1 + n).map(r.getString).toVector).toMap
    assert(a.keySet === b.keySet)
    assert(a.keySet.size === 4) // "short" filtered
    a.foreach { case (id, sig) => assert(b(id) === sig, s"doc $id") }
  }

  test("null and sub-width texts yield null signatures") {
    import spark.implicits._
    val df = Seq((1L, "tiny"), (2L, "exactly8")).toDF("id", "text")
    val rows = df.select(col("id"),
        MinHashSig.minhash_sig(col("text"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(rows(1L) == null)
    assert(rows(2L) != null)
  }
}
