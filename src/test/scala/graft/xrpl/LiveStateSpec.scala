package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xrpl.api.LiveState

/** The live-state API must mirror the reference proxy's request
  * semantics (lib/rippled.js): getBalances puts the XRP balance
  * first, applies currency/counterparty filters and the limit slice;
  * getOrders returns only OPEN offers, oldest sequence first; and
  * the frontier balance must equal the last change row's
  * final_balance — not any aggregate of changes.
  */
class LiveStateSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  lazy val tables: XrplTables =
    XrplTables.fromFiles(spark, XrplTables.fixturesPath)
  lazy val bc = tables.balanceChanges.toDF().cache()
  lazy val offers = tables.offers.toDF().cache()

  private def someAccount(): String =
    bc.filter(col("currency") === "XRP")
      .select(col("account")).head().getString(0)

  test("getBalances: XRP first, then lines ordered, limit respected") {
    // pick an account that has BOTH an XRP balance and trust lines
    val acct = bc.groupBy(col("account"))
      .agg(countDistinct(col("currency")).as("ncur"))
      .filter(col("ncur") > 1)
      .select(col("account")).head().getString(0)
    val rows = LiveState.getBalances(bc, acct).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[String]("currency") === "XRP",
      "XRP balance must be unshifted first")
    assert(rows.count(_.getAs[String]("currency") == "XRP") === 1)
    // limit slices after the XRP-first ordering
    val limited = LiveState.getBalances(bc, acct, limit = 1).collect()
    assert(limited.length === 1 &&
      limited.head.getAs[String]("currency") === "XRP")
    // currency filter
    val xrpOnly = LiveState.getBalances(bc, acct,
      currency = Some("XRP")).collect()
    assert(xrpOnly.forall(_.getAs[String]("currency") == "XRP"))
  }

  test("frontier balance equals the LAST final_balance, not a sum") {
    val acct = someAccount()
    // independent recomputation: order this account's XRP changes by
    // the canonical key and take the last final_balance
    val expected = bc
      .filter(col("account") === acct && col("currency") === "XRP")
      .orderBy(desc("ledger_index"), desc("tx_index"),
        desc("node_index"))
      .select(col("final_balance").cast("double")).head().getDouble(0)
    val got = LiveState.balances(bc)
      .filter(col("account") === acct && col("currency") === "XRP")
      .select(col("value")).head().getDouble(0)
    assert(got === expected)
  }

  test("getOrders: only open offers, oldest first; closed offers absent") {
    val open = LiveState.openOffers(offers)
    val openCount = open.count()
    assert(openCount > 0, "fixtures should leave some offers open")
    // every open (account, seq) must NOT have a later DeletedNode
    val lastDeleted = offers
      .groupBy(col("account"), col("offer_sequence"))
      .agg(max_by(col("node_type"),
        struct(col("ledger_index"), col("tx_index"), col("node_index")))
        .as("last_nt"))
    val contradictions = open.select(col("account"), col("offer_sequence"))
      .join(lastDeleted.filter(col("last_nt") === "DeletedNode"),
        Seq("account", "offer_sequence"))
      .count()
    assert(contradictions === 0L)
    // per-account ordering + limit
    val acct = open.select(col("account")).head().getString(0)
    val seqs = LiveState.getOrders(offers, acct)
      .select(col("offer_sequence")).collect().map(_.getLong(0))
    assert(seqs.sameElements(seqs.sorted))
    assert(LiveState.getOrders(offers, acct, limit = 1).count() === 1L)
  }
}
