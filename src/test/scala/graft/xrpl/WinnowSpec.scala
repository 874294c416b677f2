package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowFp

/** The codegen'd winnowing expression must produce EXACTLY the values
  * of the declarative transform → md5 k-gram → window array_min →
  * distinct → sort plan (which stays as the DuckDB oracle SQL).
  */
class WinnowSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def declarative(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) =
    df.filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"),
        expr(s"""transform(sequence(1, length(text) - ${k - 1}),
          | i -> md5(substring(text, i, $k)))""".stripMargin).as("hashes"))
      .select(col("doc_id"),
        expr(s"""array_sort(array_distinct(transform(
          | sequence(1, size(hashes) - ${w - 1}),
          | j -> array_min(slice(hashes, j, $w)))))""".stripMargin).as("fp"))

  private def viaExpression(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) =
    df.filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"), WinnowFp.winnow_fp(col("text"), k, w).as("fp"))

  test("expression equals declarative winnow for varied texts") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",             // all-equal hashes (tie path)
      "abcabcabcabcabc",                   // periodic
      "exactly11ch",                       // minimal k+w-1 length
      "unicode 😀🔥😀🔥 mixed ascii text", // supplementary plane
      "short"                              // filtered out
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // RDD-backed so the expression runs through codegen, not folding
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts)).toDF("doc_id", "text")
    Seq((8, 4), (4, 3), (2, 5)).foreach { case (k, w) =>
      val want = declarative(df, k, w).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val got = viaExpression(df, k, w).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got === want, s"k=$k w=$w")
    }
  }

  test("sub-window texts yield null fingerprints") {
    import spark.implicits._
    val df = Seq((1L, "0123456789")).toDF("doc_id", "text")
    val r = df.select(WinnowFp.winnow_fp(col("text"), 8, 4)).head()
    assert(r.isNullAt(0))
  }
}
