package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-check for ts_dtw_pairs: the gate's min-plus
  * unrolled DP (dp[i][j] = C[j] + min_{k≤j}(min(prev[k], prev[k−1])
  * − C[k−1])) must equal the textbook O(nm) recurrence
  * dp[i][j] = |a_i − b_j| + min(dp[i−1][j], dp[i][j−1],
  * dp[i−1][j−1]) on the real event series — engine parity alone
  * would not catch a shared reformulation bug.
  */
class DtwSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def naiveDtw(a: Seq[Long], b: Seq[Long]): Long = {
    val inf = Long.MaxValue / 4
    val dp = Array.fill(a.size + 1, b.size + 1)(inf)
    dp(0)(0) = 0L
    for (i <- 1 to a.size; j <- 1 to b.size)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
    dp(a.size)(b.size)
  }

  test("gate DTW equals the textbook recurrence on real event series") {
    val dir = "/root/testdata/sf0.001"
    val ser = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("x"))
      .groupBy(col("event_type"))
      .agg(expr("transform(array_sort(collect_list(struct(day, x)))," +
        " p -> p.x)").as("xs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val gate = graft.SparkEntry.queries("ts_dtw_pairs")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4))
      .toMap
    assert(gate.size == 10, "5 series -> 10 pairs")
    gate.foreach { case ((a, b), v) =>
      assert(v == naiveDtw(ser(a), ser(b)),
        s"($a, $b): gate $v vs naive ${naiveDtw(ser(a), ser(b))}")
    }
  }
}
