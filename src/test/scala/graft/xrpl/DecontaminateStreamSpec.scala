package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineOps
import graft.streaming.DecontaminateStream
import graft.streaming.DecontaminateStream.{ContamVerdict, DocText}

/** Streaming decontamination must equal the batch `decontaminate` gate
  * on the same corpus/eval split.
  */
class DecontaminateStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"
  private val n = PipelineOps.ContamNgram
  private val m = PipelineOps.EvalModulus

  test("stream verdicts equal the batch gate row for row") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[DocText].collect().toSeq
    val evalGrams = spark.sparkContext.broadcast(
      docs.filter(_.doc_id % m == 0)
        .flatMap(d => DecontaminateStream.grams(d.text, n)).toSet)

    val stream = MemoryStream[DocText]
    // two micro-batches to prove statelessness across batches
    val (first, second) = docs.filter(_.doc_id % m != 0).splitAt(docs.size / 2)
    val q = DecontaminateStream
      .verdicts(spark, stream.toDS(), evalGrams, n)
      .writeStream.format("memory").queryName("decontam").outputMode("append")
      .start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
      val got = spark.table("decontam").as[ContamVerdict].collect()
        .map(v => v.doc_id -> (v.n_shared, v.contaminated)).toMap
      val batch = SparkEntryAccess.decontaminate(spark, dir)
      assert(got === batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}

/** Reads the batch gate's output as a comparable map. */
object SparkEntryAccess {
  def decontaminate(spark: org.apache.spark.sql.SparkSession,
      dir: String): Map[Long, (Long, Boolean)] =
    graft.SparkEntry.queries("decontaminate")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2) == 1))
      .toMap
}
