package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopNgramCount.top_ngram_count

/** The codegen'd max-n-gram-multiplicity expression must equal the
  * declarative sort_array + run-length fold plan it replaces.
  */
class TopNgramSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def foldPlan(ng: String): String =
    s"""aggregate(sort_array($ng),
       |  named_struct('prev', CAST(NULL AS STRING),
       |               'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
       |  (a, x) -> named_struct('prev', x,
       |    'run', IF(x <=> a.prev, a.run + CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
       |    'best', GREATEST(a.best,
       |      IF(x <=> a.prev, a.run + CAST(1 AS BIGINT), CAST(1 AS BIGINT)))),
       |  a -> a.best)""".stripMargin

  private def ngArray(n: Int): String =
    if (n == 1) "ts"
    else {
      val parts = (0 until n)
        .map(k => s"element_at(ts, i + $k)").mkString(", ' ', ")
      s"""IF(size(ts) >= $n, transform(sequence(1, size(ts) - ${n - 1}),
         |  i -> concat($parts)), CAST(array() AS ARRAY<STRING>))""".stripMargin
    }

  test("expression equals sort_array + fold on fixture documents") {
    val ts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
    for (n <- 1 to 3) {
      val mismatches = ts
        .withColumn("fast", top_ngram_count(col("ts"), n))
        .withColumn("slow", expr(foldPlan(ngArray(n))))
        .filter(not(col("fast") <=> col("slow")))
        .count()
      assert(mismatches === 0, s"n=$n")
    }
  }

  test("edge cases: short arrays, repeats, nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a")),                      // single token
      (2L, Seq("a", "a", "a")),            // all-repeat
      (3L, Seq("a", "b", "a", "b", "a")),  // alternating bigram repeat
      (4L, Seq.empty[String])              // empty
    ).toDF("id", "ts")
    val got = df
      .select(col("id"),
        top_ngram_count(col("ts"), 1).as("u"),
        top_ngram_count(col("ts"), 2).as("b"),
        top_ngram_count(col("ts"), 3).as("t"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((1L, 0L, 0L)))
    assert(got(2L) === ((3L, 2L, 1L)))
    assert(got(3L) === ((3L, 2L, 2L))) // "a b a" and "b a b": max 2...
    assert(got(4L) === ((0L, 0L, 0L)))
    val withNull = Seq((1L, Option.empty[Seq[String]])).toDF("id", "ts")
      .select(top_ngram_count(col("ts"), 2).as("b")).collect()
    assert(withNull.head.isNullAt(0))
  }
}
