package graft.xrpl

import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AsOfJoin

/** Backward as-of join semantics: greatest build time ≤ probe time,
  * inclusive at equality, null when nothing precedes. The bucketed
  * (skew-proof) variant must agree with the window formulation on
  * every input, including a single pathological key.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val rates = Seq( // (ccy, t, rate)
    ("usd", 10L, 1.0), ("usd", 20L, 2.0), ("usd", 30L, 3.0),
    ("eur", 15L, 9.0))
  private val trades = Seq( // (trade_id, ccy, t)
    (1L, "usd", 5L),   // before any rate -> null
    (2L, "usd", 10L),  // equal timestamp -> inclusive (1.0)
    (3L, "usd", 25L),  // between 20 and 30 -> 2.0
    (4L, "usd", 99L),  // after all -> 3.0
    (5L, "eur", 15L),  // exactly the only eur rate
    (6L, "chf", 50L))  // key with no build rows -> null
  private val expected = Map(
    1L -> None, 2L -> Some(1.0), 3L -> Some(2.0),
    4L -> Some(3.0), 5L -> Some(9.0), 6L -> None)

  private def run(join: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
      : Map[Long, Option[Double]] = {
    import spark.implicits._
    join(trades.toDF("trade_id", "ccy", "t"), rates.toDF("ccy", "t", "rate"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
  }

  test("picks the latest at-or-before build row per key") {
    assert(run((p, b) =>
      AsOfJoin.asofBackward(p, "ccy", "t", b, "ccy", "t", Seq("rate")))
      === expected)
  }

  test("bucketed variant matches on the semantic fixture") {
    assert(run((p, b) =>
      AsOfJoin.asofBackwardBucketed(p, "ccy", "t", b, "ccy", "t",
        Seq("rate"), partitions = 4)) === expected)
  }

  test("bucketed equals window formulation on random skewed data") {
    import spark.implicits._
    // deterministic pseudo-random data with one hot key (0) carrying
    // half of all rows, so several range partitions hold only key 0
    val rnd = new scala.util.Random(20260812L)
    val build = Seq.tabulate(400) { i =>
      val k = if (i % 2 == 0) 0L else 1L + rnd.nextInt(5)
      (k, rnd.nextInt(1000).toLong, i.toDouble)
    }.distinctBy(r => (r._1, r._2)) // unique per (key, t) contract
    val probe = Seq.tabulate(2000) { i =>
      val k = if (i % 2 == 0) 0L else rnd.nextInt(8).toLong
      (i.toLong, k, rnd.nextInt(1100).toLong)
    }
    val b = build.toDF("k", "t", "v")
    val p = probe.toDF("id", "k", "t")
    def toMapOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    val window = toMapOf(
      AsOfJoin.asofBackward(p, "k", "t", b, "k", "t", Seq("v")))
    val bucketed = toMapOf(
      AsOfJoin.asofBackwardBucketed(p, "k", "t", b, "k", "t", Seq("v"),
        partitions = 8))
    assert(bucketed === window)
    assert(window.size === 2000)
  }

  test("bucketed plan has no per-key window over the raw rows") {
    import spark.implicits._
    // one single key: the window formulation would serialize all rows
    // into one task; the bucketed plan must keep every data-sized
    // window partitioned by the physical partition id
    val b = Seq.tabulate(500)(i => (7L, i.toLong * 2, i.toDouble))
      .toDF("k", "t", "v")
    val p = Seq.tabulate(3000)(i => (i.toLong, 7L, i.toLong % 1000))
      .toDF("id", "k", "t")
    val (plan, ranged) = AsOfJoin.asofBackwardBucketedPlan(
      p, "k", "t", b, "k", "t", Seq("v"), 8)
    try {
      // run first so AQE finalizes, then recurse through the adaptive
      // wrapper to reach the physical window nodes
      val rows = plan.collect()
      def allWindows(sp: org.apache.spark.sql.execution.SparkPlan)
          : Seq[WindowExec] = sp.collect {
        case w: WindowExec => Seq(w)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allWindows(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allWindows(q.plan)
      }.flatten
      val windows = allWindows(plan.queryExecution.executedPlan)
      assert(windows.nonEmpty)
      windows.foreach { w =>
        // a window ordering raw rows by event time must be bucketed:
        // partition spec = (pid, key), never the key alone
        val ordersByTime = w.orderSpec.exists(_.child.toString.contains("__t"))
        if (ordersByTime)
          assert(w.partitionSpec.size === 2,
            s"data-sized window not pid-bucketed: $w")
        else
          // the carry window runs over the per-(pid,key) aggregate —
          // ordered by pid, bounded by keys + partitions rows
          assert(w.orderSpec.exists(_.child.toString.contains("__pid")))
      }
      // and the results still match the window formulation
      val got = rows.map(r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      val want = AsOfJoin.asofBackward(p, "k", "t", b, "k", "t", Seq("v"))
        .collect().map(r =>
          r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got === want)
    } finally ranged.unpersist()
  }
}
