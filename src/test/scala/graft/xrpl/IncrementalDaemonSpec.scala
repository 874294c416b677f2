package graft.xrpl

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DaemonStream, IncrementalDaemon}
import graft.xrpl.agg.Aggregations

/** The incremental-merge (deployment-shape) daemons: the published
  * store after N micro-batches must be VALUE-IDENTICAL to the one-shot
  * batch aggregation over the same rows — counts, exact decimal/limb
  * sums, ratio metrics and distinct-counterparty sets all merge
  * associatively — and the state chain must survive replays, restarts
  * and retention. Also pins the staging-compaction protocol of the
  * stage-and-rebuild daemons (VERDICT r11 #6).
  */
class IncrementalDaemonSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  lazy val tables: XrplTables =
    XrplTables.fromFiles(spark, XrplTables.fixturesPath)

  /** Two-file drop dir of compact single-line ledger JSON. */
  private def mkDropDir(): String = {
    import spark.implicits._
    val dropDir = Files.createTempDirectory("graft-inc-drop").toString
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
      assert(q.recentProgress.length >= 2) // the merge ran per batch
    } finally q.stop()
  }

  test("incremental payment-volume daemon: store equals the batch table") {
    val dir = Files.createTempDirectory("graft-inc-pay").toString
    runDaemon(DaemonStream.paymentVolumeDaemonIncremental(_, _, _), dir)
    rowExact(
      spark.read.parquet(s"$dir/store/payment_volume"),
      Aggregations.paymentVolume(tables.payments.toDF(), "day"),
      "incremental payment_volume")
  }

  test("incremental stats daemon: store equals the batch table") {
    val dir = Files.createTempDirectory("graft-inc-stats").toString
    runDaemon(DaemonStream.statsDaemonIncremental(_, _, _), dir)
    rowExact(
      spark.read.parquet(s"$dir/store/stats"),
      Aggregations.stats(tables.transactions.toDF(),
        tables.payments.toDF(), tables.exchanges.toDF(),
        tables.accountsCreated.toDF(), tables.ledgers.toDF(), "day"),
      "incremental stats")
  }

  test("incremental fee daemon: store equals the batch table") {
    val dir = Files.createTempDirectory("graft-inc-fees").toString
    runDaemon(DaemonStream.feeDaemonIncremental(_, _, _), dir)
    rowExact(
      spark.read.parquet(s"$dir/store/fees"),
      Aggregations.feeRollup(tables.feeSummaries.toDF(), "hour"),
      "incremental fees")
  }

  test("account-payments daemon (A5): store equals the batch table") {
    val dir = Files.createTempDirectory("graft-inc-ap").toString
    runDaemon(DaemonStream.accountPaymentsDaemon(_, _, _), dir)
    // the published store renders the counterparty SETS sorted
    // (collect_set order is nondeterministic); compare the batch side
    // through the same canonical sort
    val batch = Aggregations.accountPayments(tables.payments.toDF())
      .withColumn("sent_counterparties",
        sort_array(col("sent_counterparties")))
      .withColumn("received_counterparties",
        sort_array(col("received_counterparties")))
    rowExact(
      spark.read.parquet(s"$dir/store/account_payments"),
      batch, "account_payments")
  }

  test("live-state daemon: maintained frontier equals the full-scan tables") {
    import graft.xrpl.api.LiveState
    val dir = Files.createTempDirectory("graft-inc-live").toString
    runDaemon(DaemonStream.liveStateDaemon(_, _, _), dir)
    rowExact(
      spark.read.parquet(s"$dir/store/live_balances"),
      LiveState.balances(tables.balanceChanges.toDF()),
      "maintained live balances")
    rowExact(
      spark.read.parquet(s"$dir/store/open_offers"),
      LiveState.openOffers(tables.offers.toDF()),
      "maintained open offers")
  }

  test("incremental daemon restart from checkpoint continues the state chain") {
    import spark.implicits._
    val dropDir = Files.createTempDirectory("graft-inc-rr-drop").toString
    val ckptDir = Files.createTempDirectory("graft-inc-rr-ckpt").toString
    val outDir = Files.createTempDirectory("graft-inc-rr-out").toString
    val raw = spark.read.option("wholetext", "true")
      .text(XrplTables.fixturesPath).as[String].collect()
    val lines = raw.map(s => Json.parse(s).toString)
    val (first, second) = lines.splitAt(lines.length / 2)

    def start() = {
      val stream = spark.readStream.schema("value STRING").text(dropDir)
      DaemonStream.paymentVolumeDaemonIncremental(spark, stream, outDir,
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
      "restarted incremental payment_volume")
  }

  test("incremental step: replay is idempotent, retention keeps <=2 states") {
    val dir = Files.createTempDirectory("graft-inc-replay").toString
    val pay = tables.payments.toDF()
    val (b0, b1) = (pay.filter(col("ledger_index") % 2 === 0),
      pay.filter(col("ledger_index") % 2 === 1))
    def step(b: DataFrame, id: Long): DataFrame =
      IncrementalDaemon.step(spark, s"$dir/state", id,
        Aggregations.paymentVolumeState(b, "day"))(
        Aggregations.reducePaymentVolumeState)
    step(b0, 0L)
    step(b1, 1L)
    val replayed = step(b1, 1L) // a foreachBatch replay of batch 1
    rowExact(Aggregations.publishPaymentVolume(replayed),
      Aggregations.paymentVolume(pay, "day"), "replayed incremental")
    // a third (empty) batch advances the chain without changing values
    val st2 = step(pay.limit(0), 2L)
    rowExact(Aggregations.publishPaymentVolume(st2),
      Aggregations.paymentVolume(pay, "day"), "empty-batch step")
    // retention: only the current and previous state dirs remain
    val dirs = new java.io.File(s"$dir/state").list()
      .filter(_.startsWith("batch="))
    assert(dirs.toSet == Set("batch=1", "batch=2"))
  }

  test("staging compaction: store equality across fold + replay, bounded tree") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val pay = tables.payments.toDF()
    def part(i: Int): DataFrame = pay.filter(pmod(col("ledger_index"), lit(4)) === i)
    def run(id: Long): Unit =
      DaemonStream.stageAndRebuild(spark, part(id.toInt), id,
        s"$dir/staging", s"$dir/store", compactMinDirs = 2)(
        Aggregations.paymentVolume(_, "day"))
    run(0L); run(1L); run(2L); run(3L)
    run(3L) // replay of the LATEST batch, after the fold of 0..1
    rowExact(
      spark.read.parquet(s"$dir/store"),
      Aggregations.paymentVolume(pay, "day"),
      "compacted store after replay")
    val names = new java.io.File(s"$dir/staging").list()
      .filter(n => n.startsWith("batch=") || n.startsWith("compact="))
    assert(names.count(_.startsWith("compact=")) == 1,
      s"exactly one consolidated dir: ${names.toSeq}")
    assert(names.length <= 3, s"bounded staging tree: ${names.toSeq}")
    // the selective reader sees every staged row exactly once
    assert(DaemonStream.readStaging(spark, s"$dir/staging").count()
      == pay.count())
  }

  test("crash-partial compact dir (no _SUCCESS) is invisible and purged") {
    val dir = Files.createTempDirectory("graft-partial").toString
    val pay = tables.payments.toDF()
    def part(i: Int): DataFrame =
      pay.filter(pmod(col("ledger_index"), lit(4)) === i)
    // four committed batch dirs — a live staging tree
    (0 to 3).foreach { i =>
      part(i).write.parquet(s"$dir/staging/batch=$i")
    }
    // simulate a fold that crashed after writing its consolidated dir
    // but before committing: compact=3 claims to cover batches 0..3
    // yet holds only batch 0's rows, and carries no _SUCCESS marker
    part(0).write.parquet(s"$dir/staging/compact=3")
    val marker = new java.io.File(s"$dir/staging/compact=3/_SUCCESS")
    assert(marker.delete(), "test setup: drop the commit marker")
    // the reader must ignore the marker-less dir and see every staged
    // row exactly once (a reader that preferred the partial compact=3
    // would silently drop batches 1..3)
    assert(DaemonStream.readStaging(spark, s"$dir/staging").count()
      == pay.count(), "partial compact dir must be invisible to reads")
    // the next fold lands on the SAME K = 3: the stale partial dir is
    // deleted before the rewrite and the rewrite commits its marker
    DaemonStream.compactStaging(spark, s"$dir/staging", 4L, minDirs = 2)
    assert(new java.io.File(s"$dir/staging/compact=3/_SUCCESS").exists(),
      "same-K fold must commit a consolidated dir with a marker")
    val names = new java.io.File(s"$dir/staging").list()
      .filter(n => n.startsWith("batch=") || n.startsWith("compact="))
    assert(names.toSet == Set("compact=3"),
      s"fold collapses the tree to one committed dir: ${names.toSeq}")
    assert(DaemonStream.readStaging(spark, s"$dir/staging").count()
      == pay.count(), "post-fold view is complete")
  }
}
