package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xrpl.agg.{Aggregations, Candles}

/** Aggregation-layer tests over the parsed mock ledgers: candle
  * cascade invariants, volumes, stats, fee rollups — mirroring the
  * reference's test/aggregationTests.
  */
class AggSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  lazy val tables: XrplTables = {
    val path = XrplTables.fixturesPath
    XrplTables.fromFiles(spark, path)
  }
  lazy val exchanges = tables.exchanges.toDF().cache()

  test("minute candles: one row per (pair, minute); OHLC invariants hold") {
    val c = Candles.fromExchanges(exchanges)
    val rows = c.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val high = r.getAs[Double]("high")
      val low = r.getAs[Double]("low")
      val open = r.getAs[Double]("open")
      val close = r.getAs[Double]("close")
      assert(low <= high + 1e-12)
      assert(open >= low - 1e-12 && open <= high + 1e-12)
      assert(close >= low - 1e-12 && close <= high + 1e-12)
      assert(r.getAs[Double]("buy_volume") <= r.getAs[Double]("base_volume") + 1e-9)
    }
    // grouping key is unique
    assert(c.groupBy((col("start") +: Candles.pairCols.map(col)): _*)
      .count().filter(col("count") > 1).count() === 0L)
  }

  test("cascade: volumes and counts are conserved at every interval") {
    val minute = Candles.fromExchanges(exchanges)
    val totalCount = minute.agg(sum("count")).head().getLong(0)
    val totalBase = minute
      .groupBy(Candles.pairCols.map(col): _*).agg(sum("base_volume").as("v"))
      .collect().map(r => r.getAs[Double]("v")).sum
    for ((name, multiple, unit) <- Candles.intervals if name != "1minute") {
      val rolled = Candles.rollup(minute, unit, multiple)
      assert(rolled.agg(sum("count")).head().getLong(0) === totalCount,
        s"count conserved at $name")
      val rolledBase = rolled
        .groupBy(Candles.pairCols.map(col): _*).agg(sum("base_volume").as("v"))
        .collect().map(r => r.getAs[Double]("v")).sum
      assert(math.abs(rolledBase - totalBase) < 1e-6, s"base volume at $name")
    }
  }

  test("cascade: daily rollup equals direct daily aggregation") {
    val minute = Candles.fromExchanges(exchanges)
    // issuer columns are null for XRP legs — make the join null-safe
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.na.fill("", Seq("base_issuer", "counter_issuer"))
    val viaCascade = keyed(Candles.rollup(minute, "day", 1))
    val direct = keyed(Candles.fromExchanges(exchanges, "day", 1))
    val joined = viaCascade.as("a").join(direct.as("b"),
      Seq("start") ++ Candles.pairCols)
    assert(joined.count() === direct.count())
    assert(joined.count() === viaCascade.count())
    // open/close picked via sort keys must agree exactly
    assert(joined.filter(col("a.open") =!= col("b.open") ||
      col("a.close") =!= col("b.close") ||
      col("a.count") =!= col("b.count")).count() === 0L)
  }

  test("payment volume: counts per currency sum to 182") {
    val vol = Aggregations.paymentVolume(tables.payments.toDF())
    assert(vol.agg(sum("count")).head().getLong(0) === 182L)
    assert(vol.filter(col("amount") < 0).count() === 0L)
  }

  test("account payments: sent+received counts double-count each payment") {
    val ap = Aggregations.accountPayments(tables.payments.toDF())
    val sums = ap.agg(sum("payments_sent"), sum("payments_received")).head()
    assert(sums.getLong(0) === 182L)
    assert(sums.getLong(1) === 182L)
  }

  test("stats: 7 daily rows per ubiquitous metric; type counts match tx counts") {
    val s = Aggregations.stats(tables.transactions.toDF(),
      tables.payments.toDF(), exchanges, tables.accountsCreated.toDF(),
      tables.ledgers.toDF())
    val txDays = s.filter(col("family") === "metric" &&
      col("name") === "transaction_count")
    assert(txDays.count() === 7L)
    val totalTx = txDays.agg(sum("value")).head().getDouble(0)
    assert(totalTx === tables.transactions.count().toDouble)
    // per-type counts also sum to the total
    val typeTotal = s.filter(col("family") === "type").agg(sum("value"))
      .head().getDouble(0)
    assert(typeTotal === totalTx)
  }

  test("account payments normalize to XRP via daily rates (A5/J4)") {
    val rates = Aggregations.dailyXrpRates(exchanges)
    assert(rates.count() > 0)
    assert(rates.filter(col("rate_to_xrp") <= 0).count() === 0L)
    val norm = Aggregations.accountPaymentsNormalized(
      tables.payments.toDF(), rates)
    assert(norm.count() > 0)
    // XRP payments normalize 1:1 — an account paying only XRP has
    // total_sent_xrp equal to the raw XRP sum
    import org.apache.spark.sql.functions.{sum => fsum}
    val xrpOnly = tables.payments.toDF().filter(col("currency") === "XRP")
      .groupBy(col("source")).agg(
        fsum(col("delivered_amount").cast("double")).as("raw"),
        countDistinct(col("currency")).as("ncur"))
    val joined = norm.join(xrpOnly, norm("account") === xrpOnly("source"))
    assert(joined.count() > 0)
  }

  test("weekly stats re-aggregate dailies: counts sum, averages re-average") {
    val daily = Aggregations.stats(tables.transactions.toDF(),
      tables.payments.toDF(), exchanges, tables.accountsCreated.toDF(),
      tables.ledgers.toDF())
    val weekly = Aggregations.weeklyStats(daily)
    val dailyTx = daily.filter(col("family") === "metric" &&
      col("name") === "transaction_count").agg(sum("value")).head().getDouble(0)
    val weeklyTx = weekly.filter(col("family") === "metric" &&
      col("name") === "transaction_count").agg(sum("value")).head().getDouble(0)
    assert(dailyTx === weeklyTx) // counts conserved
    // week keys are Mondays
    weekly.select(col("date")).distinct().collect().foreach { r =>
      val dt = java.time.LocalDateTime.ofEpochSecond(r.getLong(0), 0,
        java.time.ZoneOffset.UTC)
      assert(dt.getDayOfWeek === java.time.DayOfWeek.MONDAY)
    }
  }

  test("fee rollup: totals conserved from per-ledger summaries") {
    val perLedger = tables.feeSummaries.toDF()
    val rolled = Aggregations.feeRollup(perLedger, "day")
    val a = perLedger.agg(sum("total")).head().getDouble(0)
    val b = rolled.agg(sum("total")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-9)
    assert(rolled.filter(col("min") > col("max")).count() === 0L)
  }

  test("metric volume: totals equal the sum of converted components") {
    val m = Aggregations.metricPaymentVolume(tables.payments.toDF(), exchanges)
    // XRP components convert at rate 1; totals are per-interval sums
    assert(m.filter(col("currency") === "XRP" && col("rate") =!= 1.0)
      .count() === 0L)
    val rows = m.collect()
    val byStart = rows.groupBy(_.getAs[Long]("start"))
    byStart.foreach { case (_, rs) =>
      val expected = rs.map(_.getAs[Double]("converted_amount")).sum
      val total = rs.head.getAs[Double]("total")
      assert(math.abs(total - expected) < 1e-6)
      assert(rs.head.getAs[Long]("total_count") ===
        rs.map(_.getAs[Long]("count")).sum)
    }
  }

  test("hourly metric volume rates components at their own hour") {
    import spark.implicits._
    val day = 1421193600L // 2015-01-14
    // one USD/XRP trade at 18:30 (2 XRP per USD) and a USD payment at
    // 18:45 — with day-keyed rates the 18:00 component got rate 0
    val ex = Seq(
      ("USD", "rIss", "XRP", null.asInstanceOf[String],
        day + 18 * 3600 + 1800L, "1", "2")
    ).toDF("base_currency", "base_issuer", "counter_currency",
      "counter_issuer", "time", "base_amount", "counter_amount")
    val pays = Seq(
      ("USD", "rIss", day + 18 * 3600 + 2700L, "10"),
      ("XRP", null.asInstanceOf[String], day + 3600L, "5")
    ).toDF("currency", "issuer", "time", "delivered_amount")
    val hourly = Aggregations.metricPaymentVolume(pays, ex, "hour").collect()
    val usd = hourly.find(_.getAs[String]("currency") == "USD").get
    assert(usd.getAs[Long]("start") === day + 18 * 3600)
    assert(usd.getAs[Double]("rate") === 2.0)
    assert(usd.getAs[Double]("converted_amount") === 20.0)
    val xrp = hourly.find(_.getAs[String]("currency") == "XRP").get
    assert(xrp.getAs[Double]("rate") === 1.0)
  }

  test("metric volume live: rolling 24h window relative to the frontier") {
    val pays = tables.payments.toDF()
    val live = Aggregations.metricPaymentVolumeLive(pays, exchanges)
    val maxT = pays.agg(max("time")).head().getLong(0)
    val windowed = pays.filter(col("time") > maxT - 86400L)
    // component counts cover exactly the rolling window
    val expected = windowed.count()
    assert(live.agg(sum("count")).head().getLong(0) === expected)
    assert(live.select("total_count").distinct().count() === 1L)
  }

  test("issuer capitalization sampling: as-of value at calendar boundaries") {
    import spark.implicits._
    // synthetic sparse series: one issuer, changes on two days
    val day = 86400L
    val monday = 1420416000L // 2015-01-05, a Monday
    val bc = Seq(
      // (account, counterparty, currency, change, time, ledger, tx, node)
      ("rA", "rIssuer", "USD", "10.0", monday - 3 * day),
      ("rA", "rIssuer", "USD", "5.0", monday + 2 * day),
      ("rA", "rIssuer", "USD", "-20.0", monday + 9 * day))
      .toDF("account", "counterparty", "currency", "change", "time")
    val sampled = Aggregations.issuerCapitalizationSampled(
      bc, "week", monday - 3 * day, monday + 15 * day)
      .collect()
    val byDate = sampled.map(r =>
      r.getAs[Long]("date") -> r.getAs[Double]("amount")).toMap
    // boundary Monday: cumulative through Sunday = 10
    assert(math.abs(byDate(monday) - 10.0) < 1e-9)
    // next Monday: 10 + 5 = 15
    assert(math.abs(byDate(monday + 7 * day) - 15.0) < 1e-9)
    // following Monday: 15 - 20 = -5 → clamped to 0 (data.js:962-965)
    assert(math.abs(byDate(monday + 14 * day) - 0.0) < 1e-9)
  }
}
