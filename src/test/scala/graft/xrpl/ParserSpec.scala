package graft.xrpl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests: the Scala parsers over the reference's 50+ mock
  * ledgers (src/test/resources/ledgers, copied verbatim from
  * /root/reference/test/mock/ledgers). Expected values come from the
  * reference's own endpoint tests (test/test.*.js — cited per assert).
  */
class ParserSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  lazy val tables: XrplTables = {
    val path = XrplTables.fixturesPath
    XrplTables.fromFiles(spark, path)
  }

  test("parses all mock ledgers") {
    val ledgers = tables.ledgers.collect()
    assert(ledgers.length === 54)
    // latest ledger is the paychan fixture (test/test.ledgers.js:30-45)
    assert(ledgers.map(_.ledger_index).max === 29709909L)
    assert(ledgers.exists(_.ledger_index === 11119599L))
  }

  test("payments: 182 total (test/test.payments.js:26)") {
    assert(tables.payments.count() === 182L)
  }

  test("accounts created: 13 total (test/test.accounts.js:24)") {
    assert(tables.accountsCreated.count() === 13L)
  }

  test("exchanges: USD.rMwjYe…/XRP pair has 5 trades (test/test.exchanges.js:24)") {
    import org.apache.spark.sql.functions._
    val ex = tables.exchanges
      .filter(col("base_currency") === "USD" &&
        col("base_issuer") === "rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q" &&
        col("counter_currency") === "XRP")
    assert(ex.count() === 5L)

    // 2 trades within 2015-01-14T18:28:40–18:51:40 (test.exchanges.js:47-72)
    val start = java.time.Instant.parse("2015-01-14T18:28:40Z").getEpochSecond
    val end = java.time.Instant.parse("2015-01-14T18:51:40Z").getEpochSecond
    assert(ex.filter(col("time").between(start, end)).count() === 2L)
  }

  test("exchange rows carry full provenance") {
    val e = tables.exchanges.head()
    assert(e.tx_hash.length === 64)
    assert(e.buyer.startsWith("r") && e.seller.startsWith("r"))
    assert(BigDecimal(e.rate) > 0)
    // canonical order: (cur+issuer).toLowerCase of base < counter
    val c1 = (e.base_currency + e.base_issuer.getOrElse("undefined")).toLowerCase
    val c2 = (e.counter_currency + e.counter_issuer.getOrElse("undefined")).toLowerCase
    assert(c1 <= c2)
  }

  test("escrows: 1 for rGhDCgik9CwiNpcNnYHkEHcMgw2dkLgtNB (test/test.escrows.js:22)") {
    import org.apache.spark.sql.functions._
    assert(tables.escrows
      .filter(col("account") === "rGhDCgik9CwiNpcNnYHkEHcMgw2dkLgtNB")
      .count() === 1L)
  }

  test("paychan fixture parses (ledger 29709909)") {
    import org.apache.spark.sql.functions._
    val pc = tables.paychans.filter(col("ledger_index") === 29709909L).collect()
    assert(pc.nonEmpty)
    assert(pc.head.channel.isDefined || pc.head.source.isDefined)
  }

  test("stats span 7 days (test/test.stats.js:26)") {
    import org.apache.spark.sql.functions._
    val days = tables.transactions
      .select(to_date(from_unixtime(col("executed_time"))).as("day"))
      .distinct().count()
    assert(days === 7L)
  }

  test("fee summaries: one per ledger, avg at 6 significant digits") {
    val fees = tables.feeSummaries.collect()
    assert(fees.length === 54)
    fees.filter(_.tx_count > 0).foreach { f =>
      assert(f.min <= f.avg + 1e-9 && f.avg <= f.max + 1e-9)
      assert(f.total >= f.max)
    }
  }

  test("balance changes include fee rows with node_index -1 (X8)") {
    import org.apache.spark.sql.functions._
    val feeRows = tables.balanceChanges.filter(col("change_type") === "fee")
    assert(feeRows.count() > 0)
    assert(feeRows.filter(col("node_index") =!= -1).count() === 0L)
    // every fee row change is negative XRP
    assert(feeRows.filter(col("currency") =!= "XRP").count() === 0L)
  }

  test("affected accounts index every transaction") {
    import org.apache.spark.sql.functions._
    val withTx = tables.transactions.count()
    val indexed = tables.affectedAccounts.select(col("tx_hash")).distinct().count()
    // every tx touching ≥1 account appears in the index
    assert(indexed > 0 && indexed <= withTx)
  }
}
