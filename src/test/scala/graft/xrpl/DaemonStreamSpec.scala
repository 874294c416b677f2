package graft.xrpl

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DaemonStream
import graft.xrpl.agg.Aggregations

/** Stream ≡ batch parity for the three remaining aggregation daemons
  * (payments A4, stats A6, fees A7 — lib/aggregation/{payments,stats,
  * fees}.js), mirroring StoreStreamSpec's candle-cascade proof: drive
  * each daemon with a two-file drop source (maxFilesPerTrigger=1 →
  * two real micro-batches), then assert the streamed store is
  * ROW-EXACT against the store the batch aggregation builds from the
  * same fixtures.
  */
class DaemonStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  lazy val tables: XrplTables =
    XrplTables.fromFiles(spark, XrplTables.fixturesPath)

  /** Two-file drop dir of compact single-line ledger JSON. */
  private def mkDropDir(): String = {
    import spark.implicits._
    val dropDir = Files.createTempDirectory("graft-daemon-drop").toString
    val raw = spark.read.option("wholetext", "true")
      .text(XrplTables.fixturesPath).as[String].collect()
    val lines = raw.map(s => Json.parse(s).toString)
    val (first, second) = lines.splitAt(lines.length / 2)
    Files.write(java.nio.file.Paths.get(s"$dropDir/ledgers_a.jsonl"),
      first.mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(s"$dropDir/ledgers_b.jsonl"),
      second.mkString("\n").getBytes)
    dropDir
  }

  private def rowExact(streamed: DataFrame, batch: DataFrame,
      what: String): Unit = {
    assert(streamed.count() === batch.count(), what)
    assert(streamed.exceptAll(batch).count() === 0L, what)
    assert(batch.exceptAll(streamed).count() === 0L, what)
  }

  private def runDaemon(
      start: (org.apache.spark.sql.SparkSession, DataFrame, String)
        => org.apache.spark.sql.streaming.StreamingQuery,
      outDir: String): Unit = {
    val dropDir = mkDropDir()
    val stream = spark.readStream
      .schema("value STRING").option("maxFilesPerTrigger", "1").text(dropDir)
    val q = start(spark, stream, outDir)
    try {
      q.processAllAvailable()
      assert(q.recentProgress.length >= 2) // the rebuild ran per batch
    } finally q.stop()
  }

  test("payment-volume daemon: streamed store equals the batch table") {
    val dir = Files.createTempDirectory("graft-daemon-pay").toString
    runDaemon(DaemonStream.paymentVolumeDaemon(_, _, _), dir)
    rowExact(
      spark.read.parquet(s"$dir/store/payment_volume"),
      Aggregations.paymentVolume(tables.payments.toDF(), "day"),
      "payment_volume")
  }

  test("stats daemon: streamed store equals the batch table") {
    val dir = Files.createTempDirectory("graft-daemon-stats").toString
    runDaemon(DaemonStream.statsDaemon(_, _, _), dir)
    rowExact(
      spark.read.parquet(s"$dir/store/stats"),
      Aggregations.stats(tables.transactions.toDF(),
        tables.payments.toDF(), tables.exchanges.toDF(),
        tables.accountsCreated.toDF(), tables.ledgers.toDF(), "day"),
      "stats")
  }

  test("fee daemon: streamed store equals the batch table") {
    val dir = Files.createTempDirectory("graft-daemon-fees").toString
    runDaemon(DaemonStream.feeDaemon(_, _, _), dir)
    rowExact(
      spark.read.parquet(s"$dir/store/fees"),
      Aggregations.feeRollup(tables.feeSummaries.toDF(), "hour"),
      "fees")
  }

  test("daemon restart from checkpoint: no re-staging, store equals batch") {
    import spark.implicits._
    // two drop files delivered across TWO query instances sharing one
    // checkpoint: the restarted instance must skip the already-staged
    // file (recovered offsets) and continue batch ids so staging holds
    // every payment exactly once
    val dropDir = Files.createTempDirectory("graft-daemon-rr-drop").toString
    val ckptDir = Files.createTempDirectory("graft-daemon-rr-ckpt").toString
    val outDir = Files.createTempDirectory("graft-daemon-rr-out").toString
    val raw = spark.read.option("wholetext", "true")
      .text(XrplTables.fixturesPath).as[String].collect()
    val lines = raw.map(s => Json.parse(s).toString)
    val (first, second) = lines.splitAt(lines.length / 2)

    def start() = {
      val stream = spark.readStream.schema("value STRING").text(dropDir)
      DaemonStream.paymentVolumeDaemon(spark, stream, outDir,
        checkpoint = Some(ckptDir))
    }
    Files.write(java.nio.file.Paths.get(s"$dropDir/a.jsonl"),
      first.mkString("\n").getBytes)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    Files.write(java.nio.file.Paths.get(s"$dropDir/b.jsonl"),
      second.mkString("\n").getBytes)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    rowExact(
      spark.read.parquet(s"$outDir/store/payment_volume"),
      Aggregations.paymentVolume(tables.payments.toDF(), "day"),
      "restarted payment_volume")
  }

  test("micro-batch replay is idempotent (exactly-once staging)") {
    // foreachBatch re-runs a batch after failure; a replay must
    // rewrite its own staging partition, not double-stage its rows
    val dir = Files.createTempDirectory("graft-daemon-replay").toString
    val pay = tables.payments.toDF()
    val (b0, b1) = (pay.filter(org.apache.spark.sql.functions
      .col("ledger_index") % 2 === 0), pay.filter(
      org.apache.spark.sql.functions.col("ledger_index") % 2 === 1))
    def run(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      DaemonStream.stageAndRebuild(spark, batch, id,
        s"$dir/staging/payments", s"$dir/store/payment_volume")(
        Aggregations.paymentVolume(_, "day"))
    run(b0, 0L)
    run(b1, 1L)
    run(b1, 1L) // the replay
    rowExact(
      spark.read.parquet(s"$dir/store/payment_volume"),
      Aggregations.paymentVolume(pay, "day"),
      "replayed payment_volume")
  }
}
