package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AccountState
import graft.streaming.AccountState.PaymentEvent
import graft.xrpl.catalyst.QualityDecode

/** Custom Catalyst expression + stateful streaming coverage. */
class CatalystStateSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("QualityDecode expression matches the Scala scalar and stays codegen'd") {
    import spark.implicits._
    val data = Seq(
      // last 16 hex chars = 2-char exponent + 14-char mantissa
      ("0" * 48 + "5A" + "00038D7EA4C680", "USD", "XRP"),
      ("0" * 50 + "64" + "00000000000001", "EUR", "USD"),
      ("not-a-directory".padTo(64, '0'), "USD", "XRP"))
    // RDD-backed (not LocalRelation) so the projection really runs
    // through whole-stage codegen instead of being constant-folded
    val bds = spark.createDataFrame(spark.sparkContext.parallelize(data))
      .toDF("bd", "pays", "gets")
    val out = bds.select(
      QualityDecode.quality_decode(col("bd"), col("pays"), col("gets")).as("rate"))
    val rows = out.collect()
    // row 1/2 decode; malformed row yields null (fallback path)
    assert(rows(0).getString(0) ===
      Scalars.fmt(Scalars.parseQuality("0" * 48 + "5A" + "00038D7EA4C680", "USD", "XRP")))
    assert(rows(1).getString(0) === "1")
    // SQL registration
    QualityDecode.register(spark)
    bds.createOrReplaceTempView("bds")
    val viaSql = spark.sql(
      "SELECT xrpl_quality_decode(bd, pays, gets) AS rate FROM bds").collect()
    assert(viaSql(0).getString(0) === rows(0).getString(0))
    // whole-stage codegen keeps the expression in a codegen span —
    // the `*(n)` prefix marks WholeStageCodegen stages in plan strings
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [qualitydecode"))
  }

  test("flatMapGroupsWithState: profiles accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    val profiles = AccountState.runningProfiles(spark, input.toDS())
    val q = profiles.writeStream
      .format("memory").queryName("profiles")
      .outputMode("update")
      .start()
    try {
      input.addData(PaymentEvent("rA", "rB", 10.0, 100L),
        PaymentEvent("rA", "rC", 5.0, 110L))
      q.processAllAvailable()
      input.addData(PaymentEvent("rA", "rB", 7.0, 120L),
        PaymentEvent("rB", "rA", 1.0, 130L))
      q.processAllAvailable()
      val out = spark.table("profiles")
      // latest state for rA: 3 payments, total 22, high 10
      val rA = out.filter(col("account") === "rA")
        .orderBy(col("payments").desc).head()
      assert(rA.getAs[Long]("payments") === 3L)
      assert(math.abs(rA.getAs[Double]("total") - 22.0) < 1e-9)
      assert(rA.getAs[Double]("high") === 10.0)
      assert(rA.getAs[Long]("last_time") === 120L)
      val rB = out.filter(col("account") === "rB").head()
      assert(rB.getAs[Long]("payments") === 1L)
    } finally q.stop()
  }
}
