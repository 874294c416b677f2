package graft.operators

import graft.QuerySpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.xrpl.XrplTables

/** The XRPL domain engine wired into the driver's correctness gate.
  *
  * Each query parses the bundled reference mock ledgers (the same 54
  * fixtures the reference's test suite uses), dumps the parsed tables
  * as parquet under /tmp/graft_xrpl, runs the domain operator in
  * Spark, and pairs it with DuckDB oracle SQL reading those dumps — so
  * the exchange/payment/stats/fee query semantics are hash-verified
  * cross-engine, not just unit-tested.
  *
  * Volumes sum through DECIMAL so results are order-independent and
  * bit-identical across engines (see graft.functions.Cols).
  */
object XrplOps {

  // inside the repo (gitignored) so the driver's DuckDB stage sees the
  // same filesystem the Verify stage wrote to
  private val DumpDir = "/root/repo/target/graft_xrpl"
  private val Dec = DecimalType(38, 18)

  @volatile private var prepared = false

  /** Parse once per JVM and dump the tables DuckDB needs. */
  private def prepare(s: SparkSession): Unit = synchronized {
    if (!prepared) {
      val t = XrplTables.fromFiles(s, XrplTables.fixturesPath)
      def dump(df: DataFrame, name: String): Unit =
        df.coalesce(1).write.mode("overwrite").parquet(s"$DumpDir/$name")
      dump(t.exchanges.toDF(), "exchanges")
      dump(t.payments.toDF().drop("source_balance_changes",
        "destination_balance_changes"), "payments")
      dump(t.transactions.toDF().drop("tx_json", "meta_json"), "transactions")
      dump(t.affectedAccounts.toDF(), "affected_accounts")
      dump(t.balanceChanges.toDF(), "balance_changes")
      dump(t.feeSummaries.toDF(), "fee_summaries")
      prepared = true
    }
  }

  private def pq(s: SparkSession, name: String): DataFrame = {
    prepare(s)
    s.read.parquet(s"$DumpDir/$name")
  }

  private def t(name: String): String = s"'$DumpDir/$name/*.parquet'"

  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(Dec)).cast("double")
  // DuckDB's decimal→double cast divides the scaled int128 in floating
  // point (not correctly rounded at scale 18); routing through VARCHAR
  // gives the correctly-rounded strtod, matching Spark's
  // BigDecimal.doubleValue.
  private def dsumSql(e: String) =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)"

  // sort key shared by candle open/close selection (exchanges.js:592)
  private val skSpark = concat_ws("|",
    lpad(col("ledger_index").cast("string"), 12, "0"),
    lpad(col("tx_index").cast("string"), 5, "0"),
    lpad(col("node_index").cast("string"), 5, "0"))
  private val skSql =
    """lpad(CAST(ledger_index AS VARCHAR), 12, '0') || '|' ||
      |lpad(CAST(tx_index AS VARCHAR), 5, '0') || '|' ||
      |lpad(CAST(node_index AS VARCHAR), 5, '0')""".stripMargin.replace("\n", " ")

  def specs: Seq[QuerySpec] = Seq(
    // Raw exchange page for the canonical USD/XRP pair — the
    // /v2/exchanges scan path (data.js:1463-1750) with keyset paging.
    QuerySpec.sql(
      "xrpl_exchange_page",
      s"""SELECT base_amount, counter_amount, rate, buyer, seller, taker,
         |  provider, tx_hash, time, ledger_index, tx_index, node_index
         |FROM ${t("exchanges")}
         |WHERE base_currency = 'USD'
         |  AND base_issuer = 'rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q'
         |  AND counter_currency = 'XRP'
         |ORDER BY time, ledger_index, tx_index, node_index
         |LIMIT 200""".stripMargin) { (s, _) =>
      pq(s, "exchanges")
        .filter(col("base_currency") === "USD" &&
          col("base_issuer") === "rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q" &&
          col("counter_currency") === "XRP")
        .select(col("base_amount"), col("counter_amount"), col("rate"),
          col("buyer"), col("seller"), col("taker"), col("provider"),
          col("tx_hash"), col("time"), col("ledger_index"), col("tx_index"),
          col("node_index"))
        .orderBy(col("time"), col("ledger_index"), col("tx_index"),
          col("node_index"))
        .limit(200)
    },

    // Daily OHLC candles per pair (A1/A2 semantics; volumes via exact
    // decimal sums for cross-engine equality).
    QuerySpec.sql(
      "xrpl_candles_1day",
      s"""SELECT base_currency, COALESCE(base_issuer, '') AS base_issuer,
         |  counter_currency, COALESCE(counter_issuer, '') AS counter_issuer,
         |  (time // 86400) * 86400 AS start,
         |  min_by(CAST(rate AS DOUBLE), $skSql) AS open,
         |  max_by(CAST(rate AS DOUBLE), $skSql) AS close,
         |  max(CAST(rate AS DOUBLE)) AS high,
         |  min(CAST(rate AS DOUBLE)) AS low,
         |  ${dsumSql("base_amount")} AS base_volume,
         |  ${dsumSql("counter_amount")} AS counter_volume,
         |  ${dsumSql("CASE WHEN buyer = taker THEN base_amount ELSE '0' END")}
         |    AS buy_volume,
         |  COUNT(*) AS count
         |FROM ${t("exchanges")}
         |GROUP BY 1, 2, 3, 4, 5
         |ORDER BY 1, 2, 3, 4, 5""".stripMargin) { (s, _) =>
      pq(s, "exchanges")
        .groupBy(
          col("base_currency"),
          coalesce(col("base_issuer"), lit("")).as("base_issuer"),
          col("counter_currency"),
          coalesce(col("counter_issuer"), lit("")).as("counter_issuer"),
          ((col("time") / 86400L).cast("long") * 86400L).as("start"))
        .agg(
          min_by(col("rate").cast("double"), skSpark).as("open"),
          max_by(col("rate").cast("double"), skSpark).as("close"),
          max(col("rate").cast("double")).as("high"),
          min(col("rate").cast("double")).as("low"),
          dsum(col("base_amount")).as("base_volume"),
          dsum(col("counter_amount")).as("counter_volume"),
          dsum(when(col("buyer") === col("taker"), col("base_amount"))
            .otherwise(lit("0"))).as("buy_volume"),
          count(lit(1)).as("count"))
        .orderBy(col("base_currency"), col("base_issuer"),
          col("counter_currency"), col("counter_issuer"), col("start"))
    },

    // A4: payment volume per currency/day.
    QuerySpec.sql(
      "xrpl_payment_volume",
      s"""SELECT currency, COALESCE(issuer, '') AS issuer,
         |  (time // 86400) * 86400 AS start,
         |  COUNT(*) AS count,
         |  ${dsumSql("delivered_amount")} AS amount,
         |  ${dsumSql("delivered_amount")} / COUNT(*) AS average
         |FROM ${t("payments")}
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin) { (s, _) =>
      pq(s, "payments")
        .groupBy(col("currency"), coalesce(col("issuer"), lit("")).as("issuer"),
          ((col("time") / 86400L).cast("long") * 86400L).as("start"))
        .agg(count(lit(1)).as("count"),
          dsum(col("delivered_amount")).as("amount"))
        .withColumn("average", col("amount") / col("count"))
        .orderBy(col("currency"), col("issuer"), col("start"))
    },

    // A10: active accounts for the USD/XRP market.
    QuerySpec.sql(
      "xrpl_active_accounts",
      s"""WITH pair AS (
         |  SELECT * FROM ${t("exchanges")}
         |  WHERE base_currency = 'USD'
         |    AND base_issuer = 'rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q'
         |    AND counter_currency = 'XRP'),
         |sides AS (
         |  SELECT buyer AS account, 'buy' AS side, base_amount FROM pair
         |  UNION ALL
         |  SELECT seller AS account, 'sell' AS side, base_amount FROM pair)
         |SELECT account,
         |  ${dsumSql("CASE WHEN side = 'buy' THEN base_amount ELSE '0' END")}
         |    AS base_volume_bought,
         |  ${dsumSql("CASE WHEN side = 'sell' THEN base_amount ELSE '0' END")}
         |    AS base_volume_sold,
         |  CAST(SUM(CASE WHEN side = 'buy' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS buy_count,
         |  CAST(SUM(CASE WHEN side = 'sell' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS sell_count
         |FROM sides
         |GROUP BY account
         |ORDER BY account""".stripMargin) { (s, _) =>
      val pair = pq(s, "exchanges")
        .filter(col("base_currency") === "USD" &&
          col("base_issuer") === "rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q" &&
          col("counter_currency") === "XRP")
      val sides = pair.select(col("buyer").as("account"), lit("buy").as("side"),
          col("base_amount"))
        .unionByName(pair.select(col("seller").as("account"),
          lit("sell").as("side"), col("base_amount")))
      sides.groupBy(col("account"))
        .agg(
          dsum(when(col("side") === "buy", col("base_amount")).otherwise(lit("0")))
            .as("base_volume_bought"),
          dsum(when(col("side") === "sell", col("base_amount")).otherwise(lit("0")))
            .as("base_volume_sold"),
          sum(when(col("side") === "buy", 1).otherwise(0)).cast("long")
            .as("buy_count"),
          sum(when(col("side") === "sell", 1).otherwise(0)).cast("long")
            .as("sell_count"))
        .orderBy(col("account"))
    },

    // J1: account-transaction index join (data.js:1172-1246).
    QuerySpec.sql(
      "xrpl_account_tx_join",
      s"""SELECT t.tx_hash, t.ledger_index, t.tx_index, t.tx_type, t.tx_result,
         |  t.account
         |FROM ${t("affected_accounts")} a
         |JOIN ${t("transactions")} t ON a.tx_hash = t.tx_hash
         |WHERE a.account = 'rvYAfWj5gh67oV6fW32ZzP3Aw4Eubs59B'
         |ORDER BY t.ledger_index, t.tx_index""".stripMargin) { (s, _) =>
      val idx = pq(s, "affected_accounts")
        .filter(col("account") === "rvYAfWj5gh67oV6fW32ZzP3Aw4Eubs59B")
        .select(col("tx_hash"))
      pq(s, "transactions")
        .join(broadcast(idx), Seq("tx_hash"))
        .select(col("tx_hash"), col("ledger_index"), col("tx_index"),
          col("tx_type"), col("tx_result"), col("account"))
        .orderBy(col("ledger_index"), col("tx_index"))
    },

    // A6: daily tx-type stats (dynamic `type` family as long rows).
    QuerySpec.sql(
      "xrpl_stats_daily",
      s"""SELECT (executed_time // 86400) * 86400 AS date, tx_type,
         |  COUNT(*) AS count
         |FROM ${t("transactions")}
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin) { (s, _) =>
      pq(s, "transactions")
        .groupBy(((col("executed_time") / 86400L).cast("long") * 86400L)
          .as("date"), col("tx_type"))
        .agg(count(lit(1)).as("count"))
        .orderBy(col("date"), col("tx_type"))
    },

    // A7: daily fee rollup from per-ledger summaries.
    QuerySpec.sql(
      "xrpl_fee_rollup",
      s"""SELECT (CAST(floor(epoch(strptime(date, '%Y-%m-%dT%H:%M:%SZ')))
         |    AS BIGINT) // 86400) * 86400 AS start,
         |  ${dsumSql("total")} AS total,
         |  CAST(SUM(tx_count) AS BIGINT) AS tx_count,
         |  MIN(min) AS min, MAX(max) AS max,
         |  COUNT(*) AS ledger_count
         |FROM ${t("fee_summaries")}
         |WHERE tx_count > 0
         |GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, _) =>
      pq(s, "fee_summaries")
        .filter(col("tx_count") > 0)
        .groupBy(((unix_timestamp(col("date"), "yyyy-MM-dd'T'HH:mm:ss'Z'") /
          86400L).cast("long") * 86400L).as("start"))
        .agg(dsum(col("total")).as("total"),
          sum(col("tx_count")).cast("long").as("tx_count"),
          min(col("min")).as("min"), max(col("max")).as("max"),
          count(lit(1)).as("ledger_count"))
        .orderBy(col("start"))
    },

    // A11/W2: issuer capitalization running total per trustline currency.
    QuerySpec.sql(
      "xrpl_issuer_capitalization",
      s"""SELECT currency, counterparty AS issuer,
         |  (time // 86400) * 86400 AS date,
         |  ${dsumSql("change")} AS daily_change
         |FROM ${t("balance_changes")}
         |WHERE counterparty IS NOT NULL AND currency <> 'XRP'
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin) { (s, _) =>
      pq(s, "balance_changes")
        .filter(col("counterparty").isNotNull && col("currency") =!= "XRP")
        .groupBy(col("currency"), col("counterparty").as("issuer"),
          ((col("time") / 86400L).cast("long") * 86400L).as("date"))
        .agg(dsum(col("change")).as("daily_change"))
        .orderBy(col("currency"), col("issuer"), col("date"))
    })
}
