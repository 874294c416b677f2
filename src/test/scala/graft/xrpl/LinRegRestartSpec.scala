package graft.xrpl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeriesOps
import graft.streaming.LinRegStream

/** Crash-recovery proof for the streaming OLS twin: the query is
  * stopped after consuming half the corpus and a NEW instance restarts
  * from the same checkpoint — the recovered aggregation state must
  * still hold phase-1's sufficient statistics (the file-source offset
  * log skips the already-read file, so losing the state would silently
  * drop half the points), and the post-restart complete-mode output
  * must equal the batch gate over the full corpus bit-for-bit.
  */
class LinRegRestartSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("streaming OLS stats survive a checkpoint restart") {
    import spark.implicits._
    val dropDir = Files.createTempDirectory("graft-lr-drop").toString
    val ckptDir = Files.createTempDirectory("graft-lr-ckpt").toString

    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("value"))

    val expected = TimeSeriesOps.linregClosedForm(TimeSeriesOps.linregStats(
        TimeSeriesOps.linregPoints(
          ev.withColumn("ts", timestamp_micros(col("us"))))))
      .collect().map(_.toSeq).toSet

    val all = ev.as[LinEv].collect().sortBy(_.us)
    val (b1, b2) = all.splitAt(all.length / 2)
    def dump(path: String, rows: Seq[LinEv]): Unit =
      Files.write(Paths.get(path), rows.map(e =>
          s"""{"event_type":"${e.event_type}","us":${e.us},"value":${e.value}}""")
        .mkString("\n").getBytes)

    def startQuery() = {
      val stream = spark.readStream
        .schema("event_type STRING, us LONG, value DOUBLE")
        .json(dropDir)
      LinRegStream.stats(
          stream.withColumn("ts", timestamp_micros(col("us"))))
        .writeStream.format("memory").queryName("linreg_rr")
        .option("checkpointLocation", ckptDir)
        .outputMode("complete")
        .start()
    }

    dump(s"$dropDir/a.json", b1.toSeq)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    dump(s"$dropDir/b.json", b2.toSeq)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val got = TimeSeriesOps.linregClosedForm(spark.table("linreg_rr"))
        .collect().map(_.toSeq).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q2.stop()
  }
}
