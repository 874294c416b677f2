package graft.xrpl

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CandleStream, FunnelStream}
import graft.streaming.FunnelStream.FunnelEvent

/** Crash-recovery proof for the T5 exactly-once claim: every other
  * streaming spec drives happy-path micro-batches through one query
  * instance; here each query is STOPPED mid-stream and a fresh
  * instance restarts from the same checkpoint directory — recovered
  * offsets must skip the already-processed files and recovered state
  * must carry the pre-crash aggregation/keyed state, or the final sink
  * diverges from the batch relation.
  *
  * Both tests use the file-drop source (replayable from its offset
  * log — a MemoryStream cannot recover across instances) and a durable
  * parquet sink (a memory sink forgets its rows on restart), i.e. the
  * exact pieces the production checkpoint story is made of.
  */
class RestartRecoverySpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("CandleStream restart from checkpoint: sink equals batch candles") {
    import spark.implicits._
    val dropDir = Files.createTempDirectory("graft-rr-drop").toString
    val ckptDir = Files.createTempDirectory("graft-rr-ckpt").toString
    val outDir = Files.createTempDirectory("graft-rr-out").toString + "/sink"

    val raw = spark.read.option("wholetext", "true")
      .text(XrplTables.fixturesPath).as[String].collect()
    // arrival order must respect event time across the phase split
    // (as production ingest does): a phase-2 ledger older than
    // phase-1's watermark would be dropped as late — by design, but
    // it's watermark semantics, not the recovery under test
    val lines = raw.map(s => Json.parse(s).toString)
      .sortBy(l => LedgerParser.parseLedgerJson(l).ledger.close_time)
    val (first, second) = lines.splitAt(lines.length / 2)

    // far-future sentinel: a copy of an exchange-producing ledger with
    // close_time pushed 200 days past the LATEST fixture ledger — its
    // exchanges advance the watermark past every REAL minute window
    // (flushing them to the append sink) while its own windows stay
    // unemitted. The watermark tracks the exchange event-time column,
    // so the base must itself produce exchanges.
    val baseLine = lines.find(l =>
      LedgerParser.parseLedgerJson(l).exchanges.nonEmpty).get
    val maxClose = lines
      .map(l => LedgerParser.parseLedgerJson(l).ledger.close_time).max
    val baseClose = LedgerParser.parseLedgerJson(baseLine).ledger.close_time
    val node = Json.parse(baseLine).asInstanceOf[ObjectNode]
    node.put("close_time", node.get("close_time").asLong +
      (maxClose - baseClose) + 200L * 24 * 3600)
    node.put("ledger_index", 999999999L)
    val sentinel = node.toString

    def startQuery() = {
      val stream = spark.readStream.schema("value STRING").text(dropDir)
      CandleStream.minuteCandles(spark, stream)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
    }

    // phase 1: first half only — all candle state stays buffered
    // behind the 2 h watermark, nothing emitted yet
    Files.write(Paths.get(s"$dropDir/a.jsonl"),
      first.mkString("\n").getBytes)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: rest + sentinel, NEW query instance, SAME checkpoint —
    // the recovered state store must still hold phase-1 exchanges
    Files.write(Paths.get(s"$dropDir/b.jsonl"),
      (second :+ sentinel).mkString("\n").getBytes)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val proj = Seq("start", "base_currency", "base_issuer",
      "counter_currency", "counter_issuer", "open", "close", "high",
      "low", "base_volume", "counter_volume", "buy_volume", "count")
    val streamed = spark.read.parquet(outDir)
      .withColumn("start", col("bucket.start")).select(proj.map(col): _*)

    // batch relation: the SAME candle definition over the real lines
    // (watermark is a no-op in batch; sentinel excluded — its windows
    // were never flushed to the sink)
    Files.write(Paths.get(s"$dropDir/all_real.txt"),
      (first ++ second).mkString("\n").getBytes)
    val batch = CandleStream.minuteCandles(spark,
        spark.read.text(s"$dropDir/all_real.txt"))
      .withColumn("start", col("bucket.start")).select(proj.map(col): _*)

    val missing = batch.exceptAll(streamed).collect()
    val extra = streamed.exceptAll(batch).collect()
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.mkString("; ")} extra=${extra.mkString("; ")}")
    assert(streamed.count() === batch.count())
    assert(streamed.count() > 0L)
  }

  test("FunnelStream restart from checkpoint: keyed state survives") {
    import spark.implicits._
    val dropDir = Files.createTempDirectory("graft-rr-fdrop").toString
    val ckptDir = Files.createTempDirectory("graft-rr-fckpt").toString
    val outDir = Files.createTempDirectory("graft-rr-fout").toString + "/sink"

    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))

    // batch oracle — identical to FunnelStreamSpec's
    val weekUs = FunnelStream.WindowUs
    val s0 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us"))
    val expected = s0.join(pur,
        col("p_user") === col("user_id") && col("p_us") > col("s_us") &&
          col("p_us") <= col("s_us") + weekUs, "left")
      .groupBy(col("user_id"), col("s_us"))
      .agg(max(when(col("p_us").isNotNull, 1L).otherwise(0L)).as("converted"))
      .select(col("user_id"), col("s_us").as("signup_us"), col("converted"))
      .collect().map(_.toSeq).toSet

    val all = ev.as[FunnelEvent].collect().sortBy(_.us)
    val (b1, b2) = all.splitAt(all.length / 2)
    val sentinel = FunnelEvent(-1L, "noise",
      all.last.us + 30L * 24 * 3600 * 1000000)

    def drop(events: Seq[FunnelEvent]): Unit =
      spark.createDataset(events).repartition(1)
        .write.mode("append").parquet(dropDir)

    def startQuery() = {
      val stream = spark.readStream
        .schema("user_id BIGINT, event_type STRING, us BIGINT")
        .parquet(dropDir).as[FunnelEvent]
      FunnelStream.conversions(spark, stream, watermarkDelay = "0 seconds")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
    }

    // phase 1: first half — per-user signup/purchase state builds up,
    // few (if any) conversion windows close
    drop(b1.toSeq)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: rest + watermark-advancing sentinel on a FRESH query
    // from the same checkpoint: recovered keyed state must still hold
    // phase-1 signups (and buffered out-of-order purchases), or users
    // split across the restart report wrong conversions
    drop(b2.toSeq :+ sentinel)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .select(col("user_id"), col("signup_us"), col("converted"))
      .collect().map(_.toSeq).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("RangeJoinStream restart from checkpoint: buffered join state survives") {
    import spark.implicits._
    import graft.streaming.RangeJoinStream
    import graft.streaming.RangeJoinStream.{ClickEvent, PurchaseEvent}
    val pDir = Files.createTempDirectory("graft-rr-pdrop").toString
    val cDir = Files.createTempDirectory("graft-rr-cdrop").toString
    val ckptDir = Files.createTempDirectory("graft-rr-jckpt").toString
    val outDir = Files.createTempDirectory("graft-rr-jout").toString + "/sink"
    val dayUs = 86400000000L

    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("p_us"))
      .as[PurchaseEvent].collect().toSeq
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("us").as("c_us"))
      .as[ClickEvent].collect().toSeq

    val expected = graft.functions.RangeJoin.pointInInterval(
        purchases.toDF().withColumn("t1", col("p_us") + dayUs),
        "user_id", "p_us", "t1", clicks.toDF(), "click_user", "c_us", dayUs)
      .select(col("i_event_id"), col("i_user_id"), col("i_p_us"),
        col("p_c_us"))
      .collect().map(_.toSeq).toSet

    def startQuery() = {
      val ps = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, p_us BIGINT")
        .parquet(pDir).as[PurchaseEvent]
      val cs = spark.readStream
        .schema("click_user BIGINT, c_us BIGINT")
        .parquet(cDir).as[ClickEvent]
      RangeJoinStream.matchedPairs(spark, ps, cs, 86400L, "30 days")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
    }

    // phase 1: first half of purchases + SECOND half of clicks — the
    // pairs that straddle the split can only form if the buffered
    // sides survive the restart
    val (p1, p2) = purchases.splitAt(purchases.size / 2)
    val (c1, c2) = clicks.splitAt(clicks.size / 2)
    spark.createDataset(p1).repartition(1).write.mode("append").parquet(pDir)
    spark.createDataset(c2).repartition(1).write.mode("append").parquet(cDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: converse halves on a FRESH query from the same
    // checkpoint — recovered state-store rows must match against the
    // newly arriving opposite sides
    spark.createDataset(p2).repartition(1).write.mode("append").parquet(pDir)
    spark.createDataset(c1).repartition(1).write.mode("append").parquet(cDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .select(col("event_id"), col("user_id"), col("p_us"), col("c_us"))
      .collect().map(_.toSeq).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("Scd2Stream restart from checkpoint: open-segment state survives") {
    import spark.implicits._
    import graft.streaming.Scd2Stream
    import graft.streaming.Scd2Stream.{Ev, Segment}
    val dropDir = Files.createTempDirectory("graft-rr-sdrop").toString
    val ckptDir = Files.createTempDirectory("graft-rr-sckpt").toString
    val outDir = Files.createTempDirectory("graft-rr-sout").toString + "/sink"

    // batch oracle: the gate's CLOSED subset (open tails have no end)
    val expected = graft.SparkEntry
      .queries("events_scd2_intervals")(spark, "/root/testdata/sf0.001")
      .filter(col("end_us").isNotNull)
      .select(col("user_id"), col("seg"), col("event_type"),
        col("start_us"), col("end_us"), col("n_events"))
      .as[Segment].collect().toSet

    val all = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[Ev].collect().sortBy(e => (e.us, e.event_id))
    // split mid-run: every user's open segment at the cut must carry
    // across the restart, or straddling intervals close with the
    // wrong seg number / count
    val (b1, b2) = all.splitAt(all.length / 2)

    def drop(events: Seq[Ev]): Unit =
      spark.createDataset(events).repartition(1)
        .write.mode("append").parquet(dropDir)

    def startQuery() = {
      val stream = spark.readStream
        .schema("user_id BIGINT, us BIGINT, event_id BIGINT, event_type STRING")
        .parquet(dropDir).as[Ev]
      Scd2Stream.closedSegments(spark, stream)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
    }

    drop(b1.toSeq)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    drop(b2.toSeq)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).as[Segment].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("AttributionStream restart from checkpoint: touch buffer survives") {
    import spark.implicits._
    import graft.streaming.AttributionStream
    import graft.streaming.AttributionStream.TouchEvent
    val dropDir = Files.createTempDirectory("graft-rr-adrop").toString
    val ckptDir = Files.createTempDirectory("graft-rr-ackpt").toString
    val outDir = Files.createTempDirectory("graft-rr-aout").toString + "/sink"

    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

    // batch oracle — identical to AttributionStreamSpec's
    val tch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("t_user"), col("us").as("t_us"),
        col("event_id").as("t_id"), col("event_type").as("t_type"))
    val expected = ev.filter(col("event_type") === "purchase")
      .join(tch, col("t_user") === col("user_id") && col("t_us") <= col("us"),
        "left")
      .groupBy(col("event_id"), col("user_id"), col("us"))
      .agg(max_by(struct(col("t_id"), col("t_type")),
        struct(col("t_us"), col("t_id"))).as("w"))
      .select(col("event_id"), col("user_id"), col("us").as("ts_us"),
        col("w.t_id").as("touch_id"), col("w.t_type").as("touch_type"))
      .collect().map(_.toSeq).toSet

    val all = ev.as[TouchEvent].collect().sortBy(e => (e.us, e.event_id))
    val (b1, b2) = all.splitAt(all.length / 2)
    val sentinel = TouchEvent(-1L, -1L, "noise",
      all.last.us + 30L * 24 * 3600 * 1000000)

    def drop(events: Seq[TouchEvent]): Unit =
      spark.createDataset(events).repartition(1)
        .write.mode("append").parquet(dropDir)

    def startQuery() = {
      val stream = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, us BIGINT")
        .parquet(dropDir).as[TouchEvent]
      AttributionStream.attributions(spark, stream,
          watermarkDelay = "0 seconds")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
    }

    // phase 1: first half — per-user compacted touch buffers and
    // still-unripe purchases accumulate in the state store
    drop(b1.toSeq)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: rest + watermark-advancing sentinel on a FRESH query
    // from the same checkpoint: the recovered winning-predecessor
    // touch must still attribute phase-2 purchases, or every user
    // whose last touch predates the restart reports null
    drop(b2.toSeq :+ sentinel)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("touch_id"), col("touch_type"))
      .collect().map(_.toSeq).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
