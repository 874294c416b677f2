package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.xrpl.ParsedLedger
import graft.xrpl.agg.Aggregations

/** Streaming forms of the reference's remaining incremental
  * aggregation daemons — payments (lib/aggregation/payments.js),
  * network stats (lib/aggregation/stats.js) and fees
  * (lib/aggregation/fees.js). [[CandleStream]] covers the fourth
  * (exchanges, lib/aggregation/exchanges.js) with the same shape.
  *
  * Shape: each micro-batch's parsed rows are staged, then the
  * aggregate store is rebuilt from staging and overwritten — the
  * reference's periodic full-reload repair (exchanges.js:484-496
  * applies the same pattern to all daemons) as an idempotent batch
  * job per micro-batch. Because the rebuild calls the SAME batch
  * aggregation code ([[Aggregations]]), stream ≡ batch holds by
  * construction once staging holds every row exactly once;
  * DaemonStreamSpec proves it end-to-end (streamed store ≡
  * batch-built store, row-exact) across real multi-micro-batch runs.
  *
  * EXACTLY-ONCE staging: foreachBatch re-runs a micro-batch after a
  * failure, so a plain `append` would double-stage its rows and
  * silently inflate every aggregate. Each batch therefore OVERWRITES
  * its own `batch=<id>` staging subdirectory — a replay rewrites the
  * same rows in place (idempotent; DaemonStreamSpec pins replay ≡
  * once), and the rebuild reads the whole staging tree.
  *
  * Scale: staging is an append-only parquet log partitioned by batch
  * id; the rebuild is the batch job this engine already runs, so a
  * deployment can widen the trigger interval (or swap the full
  * rebuild for the associative re-reduce, as the candle store does)
  * without touching the stream topology. Exactness carries over:
  * every sum in these daemons rides the DECIMAL(38,18)/dsum
  * discipline or exact counts, so the rebuilt store is identical no
  * matter how arrivals were micro-batched.
  */
object DaemonStream {

  /** Stage `batch` under `stagingDir/batch=<id>` (overwrite — replay
    * safe), then rebuild the store from the full staging tree.
    */
  private[graft] def stageAndRebuild(spark: SparkSession,
      batch: DataFrame, batchId: Long, stagingDir: String,
      storeDir: String)(aggregate: DataFrame => DataFrame): Unit = {
    batch.write.mode("overwrite").parquet(s"$stagingDir/batch=$batchId")
    aggregate(spark.read.parquet(stagingDir))
      .write.mode("overwrite").parquet(storeDir)
    ()
  }

  /** A4 payment-volume daemon: per-(currency, issuer, bucket) count /
    * exact amount / average, rebuilt per micro-batch.
    * Staging: `dir`/staging/payments; store: `dir`/store/payment_volume.
    */
  def paymentVolumeDaemon(spark: SparkSession, raw: DataFrame, dir: String,
      unit: String = "day",
      checkpoint: Option[String] = None): StreamingQuery = {
    import spark.implicits._
    val w = CandleStream.parsedStream(spark, raw).flatMap(_.payments).toDF()
      .writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        stageAndRebuild(spark, batch, batchId,
          s"$dir/staging/payments", s"$dir/store/payment_volume")(
          Aggregations.paymentVolume(_, unit))
      }
      .start()
  }

  /** A6 network-stats daemon: the long-format (date, family, name,
    * value) stats table rebuilt per micro-batch. One incoming ledger
    * stream fans out to the five derived staging tables the stats
    * job reads (stats.js consumes the same five HBase feeds).
    */
  def statsDaemon(spark: SparkSession, raw: DataFrame, dir: String,
      unit: String = "day",
      checkpoint: Option[String] = None): StreamingQuery = {
    import spark.implicits._
    val w = CandleStream.parsedStream(spark, raw)
      .writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w
      .foreachBatch { (batch: Dataset[ParsedLedger], batchId: Long) =>
        def stage(df: DataFrame, name: String): Unit =
          df.write.mode("overwrite")
            .parquet(s"$dir/staging/$name/batch=$batchId")
        stage(batch.flatMap(_.transactions).toDF(), "transactions")
        stage(batch.flatMap(_.payments).toDF(), "payments")
        stage(batch.flatMap(_.exchanges).toDF(), "exchanges")
        stage(batch.flatMap(_.accountsCreated).toDF(), "accounts_created")
        stage(batch.map(_.ledger).toDF(), "ledgers")
        Aggregations.stats(
            spark.read.parquet(s"$dir/staging/transactions"),
            spark.read.parquet(s"$dir/staging/payments"),
            spark.read.parquet(s"$dir/staging/exchanges"),
            spark.read.parquet(s"$dir/staging/accounts_created"),
            spark.read.parquet(s"$dir/staging/ledgers"),
            unit)
          .write.mode("overwrite").parquet(s"$dir/store/stats")
        ()
      }
      .start()
  }

  /** A7 fee daemon: per-ledger fee summaries rolled into hour/day
    * rows, rebuilt per micro-batch.
    * Staging: `dir`/staging/fee_summaries; store: `dir`/store/fees.
    */
  def feeDaemon(spark: SparkSession, raw: DataFrame, dir: String,
      unit: String = "hour",
      checkpoint: Option[String] = None): StreamingQuery = {
    import spark.implicits._
    val w = CandleStream.parsedStream(spark, raw).map(_.feeSummary).toDF()
      .writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        stageAndRebuild(spark, batch, batchId,
          s"$dir/staging/fee_summaries", s"$dir/store/fees")(
          Aggregations.feeRollup(_, unit))
      }
      .start()
  }
}
