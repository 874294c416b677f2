package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DupNgramMass.dup_ngram_mass

/** The codegen'd duplicated-n-gram-mass expression must equal the
  * declarative spelling it replaces: n-gram positions minus
  * singletons, where a singleton in the sorted gram array differs
  * from both neighbors.
  */
class DupNgramSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  /** positions − singletons over the sorted gram array `ng`. */
  private def slowPlan(ng: String): String =
    s"""CAST(size($ng) AS BIGINT) - size(filter(
       |  sequence(1, size($ng)),
       |  i -> (i = 1 OR
       |      element_at(sorted, i) <> element_at(sorted, i - 1))
       |    AND (i = size($ng) OR
       |      element_at(sorted, i) <> element_at(sorted, i + 1))))""".stripMargin

  private def ngArray(n: Int): String =
    if (n == 1) "ts"
    else
      s"""IF(size(ts) >= $n, transform(sequence(1, size(ts) - ${n - 1}),
         |  i -> array_join(slice(ts, i, $n), ' ')),
         |  CAST(array() AS ARRAY<STRING>))""".stripMargin

  test("expression equals sorted-neighbor scan on fixture documents") {
    val ts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
    for (n <- 1 to 3) {
      val mismatches = ts
        .withColumn("ng", expr(ngArray(n)))
        .withColumn("sorted", expr("array_sort(ng)"))
        .withColumn("fast", dup_ngram_mass(col("ts"), n))
        .withColumn("slow", expr(slowPlan("ng")))
        .filter(not(col("fast") <=> col("slow")))
        .count()
      assert(mismatches === 0, s"n=$n")
    }
  }

  test("edge cases: short arrays, all-dup, all-unique, nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a")),                     // no bigram
      (2L, Seq("a", "a", "a")),           // bigrams: "a a" x2 -> 2
      (3L, Seq("a", "b", "c")),           // all unique -> 0
      (4L, Seq("a", "b", "a", "b", "a")), // "a b" x2, "b a" x2 -> 4
      (5L, Seq.empty[String]))
      .toDF("id", "ts")
    val got = df
      .select(col("id"), dup_ngram_mass(col("ts"), 2).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 0L, 4L -> 4L,
      5L -> 0L))
    // null array -> null out
    val n = df.select(dup_ngram_mass(lit(null).cast("array<string>"), 2)
      .as("d")).head()
    assert(n.isNullAt(0))
  }
}
