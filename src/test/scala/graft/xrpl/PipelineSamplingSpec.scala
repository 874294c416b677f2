package graft.xrpl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Corpus-assembly sampling operators: determinism and the two-level
  * top-k equivalence that makes temperature sampling scale-safe.
  */
class PipelineSamplingSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("temperature sampling: two-level top-k equals the naive global window") {
    // the production plan caps every sort task via (lang, salt) local
    // ranks; it must select EXACTLY the rows a single per-language
    // window would
    val got = SparkEntry.queries("sample_temperature")(spark, dir)
      .select("doc_id", "lang", "rk", "quota")
    val hv = conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(":temp"))), 1, 8),
      16, 10).cast("long")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val scaled = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("s", floor(sqrt(col("n").cast("double")) * 1e6).cast("long"))
    val quotas = scaled
      .crossJoin(broadcast(scaled.agg(sum(col("s")).as("st"))))
      .select(col("lang"),
        expr(s"(${graft.operators.PipelineOps.TempSampleK} * s) div st")
          .as("quota"))
    val naive = docs
      .select(col("doc_id"), col("lang"), hv.as("hv"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("hv"), col("doc_id"))))
      .join(quotas, Seq("lang"))
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("rk"), col("quota"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("priority sampling is deterministic and exactly k rows") {
    val a = SparkEntry.queries("sample_priority")(spark, dir).collect()
    val b = SparkEntry.queries("sample_priority")(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length ===
      math.min(graft.operators.PipelineOps.PrioritySampleK,
        spark.read.parquet(s"$dir/documents.parquet").count()).toInt)
  }

  test("decontamination never reports eval-set documents") {
    val m = graft.operators.PipelineOps.EvalModulus
    val out = SparkEntry.queries("decontaminate")(spark, dir)
    assert(out.filter(col("doc_id") % m === 0).count() === 0)
    // contaminated rows must actually share an 8-gram: spot-check via
    // the flag's consistency with n_shared
    assert(out.filter(col("contaminated") === 1 && col("n_shared") === 0)
      .count() === 0)
  }
}
