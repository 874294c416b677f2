package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AsOfJoin

/** Backward as-of join semantics: greatest build time ≤ probe time,
  * inclusive at equality, null when nothing precedes.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("picks the latest at-or-before build row per key") {
    import spark.implicits._
    val rates = Seq( // (ccy, t, rate)
      ("usd", 10L, 1.0), ("usd", 20L, 2.0), ("usd", 30L, 3.0),
      ("eur", 15L, 9.0)
    ).toDF("ccy", "t", "rate")
    val trades = Seq( // (trade_id, ccy, t)
      (1L, "usd", 5L),   // before any rate -> null
      (2L, "usd", 10L),  // equal timestamp -> inclusive (1.0)
      (3L, "usd", 25L),  // between 20 and 30 -> 2.0
      (4L, "usd", 99L),  // after all -> 3.0
      (5L, "eur", 15L),  // exactly the only eur rate
      (6L, "chf", 50L)   // key with no build rows -> null
    ).toDF("trade_id", "ccy", "t")

    val got = AsOfJoin.asofBackward(
        trades, "ccy", "t", rates, "ccy", "t", Seq("rate"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got === Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> Some(3.0), 5L -> Some(9.0), 6L -> None))
  }
}
