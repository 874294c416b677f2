package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.xrpl.{LedgerParser, ParsedLedger}

/** Structured Streaming form of the reference's in-process aggregation
  * daemons (SURVEY.md §2.10).
  *
  * The reference buffers incoming ledgers in queues drained on 200 ms
  * timers (T1), keeps per-interval caches purged hourly (T2), silently
  * drops events older than ~2 h and self-heals with a 30-minute full
  * reload (T3, exchanges.js:484-496). Here that becomes: micro-batch
  * trigger ≙ the queue drain; streaming state ≙ the cache; an explicit
  * `withWatermark("ts", "2 hours")` ≙ the late-data horizon — the same
  * policy, but well-defined and fault-tolerant via checkpointing (T5).
  */
object CandleStream {

  /** Parse a stream of raw ledger JSON lines into parsed bundles. */
  def parsedStream(spark: SparkSession, raw: DataFrame): Dataset[ParsedLedger] = {
    import spark.implicits._
    raw.select(col("value").cast("string")).as[String]
      .map(LedgerParser.parseLedgerJson _)
  }

  /** Streaming 1-minute candles with a 2-hour late-data watermark.
    * Aggregates are the same associative candle merge as the batch
    * cascade (graft.xrpl.agg.Candles), so a scheduled batch rollup can
    * re-derive coarser intervals from the streamed minutes — the
    * reference's cascade split into stream + batch repair (T3/T6).
    */
  def minuteCandles(spark: SparkSession, raw: DataFrame): DataFrame = {
    import spark.implicits._
    val exchanges = parsedStream(spark, raw).flatMap(_.exchanges)
    exchanges.toDF()
      .withColumn("ts", timestamp_seconds(col("time")))
      .withColumn("rate_d", col("rate").cast("double"))
      .withColumn("base_d", col("base_amount").cast("double"))
      .withColumn("counter_d", col("counter_amount").cast("double"))
      .withColumn("sk", concat_ws("|",
        lpad(col("ledger_index").cast("string"), 12, "0"),
        lpad(col("tx_index").cast("string"), 5, "0"),
        lpad(col("node_index").cast("string"), 5, "0")))
      .withWatermark("ts", "2 hours")
      .groupBy(
        window(col("ts"), "1 minute").as("bucket"),
        col("base_currency"), col("base_issuer"),
        col("counter_currency"), col("counter_issuer"))
      .agg(
        min_by(col("rate_d"), col("sk")).as("open"),
        max_by(col("rate_d"), col("sk")).as("close"),
        max(col("rate_d")).as("high"),
        min(col("rate_d")).as("low"),
        sum(col("base_d")).as("base_volume"),
        sum(col("counter_d")).as("counter_volume"),
        sum(when(col("buyer") === col("taker"), col("base_d")).otherwise(0d))
          .as("buy_volume"),
        count(lit(1)).as("count"))
      .withColumn("vwap", col("counter_volume") / col("base_volume"))
  }

  /** Streaming per-day network stat counters with watermark — the
    * stats daemon (lib/aggregation/stats.js) in streaming form.
    */
  def dailyTxStats(spark: SparkSession, raw: DataFrame): DataFrame = {
    import spark.implicits._
    val txs = parsedStream(spark, raw).flatMap(_.transactions)
    txs.toDF()
      .withColumn("ts", timestamp_seconds(col("executed_time")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day").as("bucket"), col("tx_type"))
      .agg(count(lit(1)).as("count"))
  }
}
