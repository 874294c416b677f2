package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.streaming.CmsStream
import graft.streaming.CmsStream.CmsDoc

/** The incrementally-maintained count-min counters must end at exactly
  * the batch gate's estimates (same slot hash, same integer counts),
  * however the stream is micro-batched; and counter states must merge
  * by elementwise addition — the property that lets shard-local
  * sketches combine at 100 TB.
  */
class CmsStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("streamed counters reproduce the batch top-20 estimates") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val expected = SparkEntry.queries("sketch_cms_topk")(spark, dir)
      .select(col("tok"), col("tf"), col("cms_est"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(expected.size == 20)

    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[CmsDoc].collect()
    val (b1, b2) = all.splitAt(all.length / 3)

    val stream = MemoryStream[CmsDoc]
    val q = CmsStream.sketches(spark, stream.toDS())
      .writeStream.format("memory").queryName("cms_rows")
      .outputMode("update").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      val rows = spark.table("cms_rows")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("row")).orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
        .select(col("row"), col("counts"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      assert(rows.size == graft.operators.TextOps.CmsDepth)
      val got = expected.map { case (tok, (tf, _)) =>
        tok -> ((tf, CmsStream.estimate(rows, tok)))
      }
      assert(got === expected)
    } finally q.stop()
  }

  test("counter states merge by elementwise addition (mergeability)") {
    val docsA = Seq("the cat sat", "the dog ran fast", "a cat")
    val docsB = Seq("the the the", "dog dog", "entirely new tokens here")
    def countersOf(row: Int, docs: Seq[String]): Array[Long] = {
      val c = Array.fill(graft.operators.TextOps.CmsWidth)(0L)
      docs.foreach(t =>
        CmsStream.tokens(t).foreach(tok => c(CmsStream.slot(row, tok)) += 1L))
      c
    }
    for (row <- 0 until graft.operators.TextOps.CmsDepth) {
      val merged = countersOf(row, docsA).zip(countersOf(row, docsB))
        .map { case (a, b) => a + b }
      assert(merged.toSeq == countersOf(row, docsA ++ docsB).toSeq)
    }
  }

  test("estimates never undercount (CMS one-sided error)") {
    val docs = Seq("x y z x", "y y q r s", "x q q q")
    val rows = (0 until graft.operators.TextOps.CmsDepth).map { i =>
      val c = Array.fill(graft.operators.TextOps.CmsWidth)(0L)
      docs.foreach(t =>
        CmsStream.tokens(t).foreach(tok => c(CmsStream.slot(i, tok)) += 1L))
      i -> c.toSeq
    }.toMap
    val exact = docs.flatMap(CmsStream.tokens)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (tok, tf) =>
      assert(CmsStream.estimate(rows, tok) >= tf)
    }
  }
}
