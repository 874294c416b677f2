package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash

/** The codegen'd SimHash expression must equal the declarative
  * token-explode → md5 → bit-vote → fingerprint plan it replaces.
  */
class SimHashSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def declarative(df: org.apache.spark.sql.DataFrame) = {
    val toks = df.select(col("id"), explode(split(col("text"), " ")).as("tok"))
    val tv = toks.select(col("id"), expr(
      """(instr('0123456789abcdef', substr(md5(tok),1,1))-1)*4096
        |+ (instr('0123456789abcdef', substr(md5(tok),2,1))-1)*256
        |+ (instr('0123456789abcdef', substr(md5(tok),3,1))-1)*16
        |+ (instr('0123456789abcdef', substr(md5(tok),4,1))-1)""".stripMargin).as("v"))
    tv.select(col("id"), col("v"), explode(expr("sequence(0, 15)")).as("j"))
      .groupBy(col("id"), col("j"))
      .agg(sum(expr("2 * (CAST(FLOOR(v / POW(2, j)) AS BIGINT) % 2) - 1")).as("vote"))
      .groupBy(col("id"))
      .agg(sum(expr("CASE WHEN vote > 0 THEN CAST(POW(2, j) AS BIGINT) ELSE 0 END"))
        .cast("long").as("simhash"))
  }

  test("expression equals explode + bit-vote plan") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox",
      "the quick brown fox jumps", // near-dup: close fingerprint expected
      "completely different content here",
      "single",
      "trailing space ", // empty token kept by split
      "double  space") // empty token mid-string
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val a = declarative(texts).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = texts.select(col("id"), SimHash.simhash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // near-dups differ in few bits; unrelated docs in many
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(b(0L), b(1L)) < hamming(b(0L), b(2L)))
  }
}
