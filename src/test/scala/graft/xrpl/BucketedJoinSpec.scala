package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xrpl.store.XrplStore

/** Co-located bucketed join: writing both sides bucketed on the join
  * key must remove every Exchange from the join's physical plan (the
  * shuffle a 100 TB index⋈detail join would otherwise pay), with
  * results identical to the plain join.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  lazy val tables: XrplTables =
    XrplTables.fromFiles(spark, XrplTables.fixturesPath)

  test("bucketed index-detail join plans no shuffle and matches plain join") {
    val idx = tables.affectedAccounts.toDF()
      .select(col("tx_hash"), col("account"), col("tx_type"))
    val det = tables.transactions.toDF()
      .select(col("tx_hash"), col("ledger_index"), col("tx_index"))
    XrplStore.writeBucketed(idx, "bkt_affected", "tx_hash", 8)
    XrplStore.writeBucketed(det, "bkt_transactions", "tx_hash", 8)
    try {
      // disable broadcast so the join genuinely exercises the bucketed
      // sort-merge path (at 100 TB neither side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_affected")
        .join(spark.table("bkt_transactions"), "tx_hash")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      val expected = idx.join(det, "tx_hash").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_affected")
      spark.sql("DROP TABLE IF EXISTS bkt_transactions")
    }
  }
}
