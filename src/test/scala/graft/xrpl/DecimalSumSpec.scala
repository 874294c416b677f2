package graft.xrpl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Cols

/** The long-limb exact decimal sum ([[Cols.dsum]]) must be value-equal
  * to the wide decimal-buffer sum it replaced, for any input order,
  * sign mix, null pattern, and 6-decimal rounding edge — the oracle
  * gate hash-compares against DuckDB's `SUM(CAST(e AS DECIMAL(38,6)))`,
  * so "close" is not enough.
  */
class DecimalSumSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def wide(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(38, 6))).cast("double")

  private def check(values: Seq[java.lang.Double], groups: Int = 3): Unit = {
    val df = values.zipWithIndex
      .map { case (v, i) => (i % groups, v) }
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(Cols.dsum($"v").as("s"))
      .orderBy($"g").collect().map(r => (r.getInt(0), r.get(1)))
    val want = df.groupBy($"g").agg(wide($"v").as("s"))
      .orderBy($"g").collect().map(r => (r.getInt(0), r.get(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("limb sum equals wide decimal sum on rounding-edge values") {
    // shortest-repr halves round HALF_UP at scale 6; mixed signs put
    // nonzero limbs in hi/mid/lo with carries across both splits
    check(Seq[java.lang.Double](
      1.0000005, -1.0000005, 2.675, -2.675, 0.1, 0.3,
      999999.999999, -999999.999999, 1e11, -1e11, 123456789.123456,
      0.0, -0.0, 1e-6, -1e-6, 5e-7, -5e-7))
  }

  test("limb sum handles nulls and all-null groups like the wide sum") {
    check(Seq[java.lang.Double](null, 1.5, null, -2.25, null, null), groups = 2)
    check(Seq[java.lang.Double](null, null, null), groups = 1)
  }

  test("limb sum equals wide decimal sum on random sign-mixed data") {
    val rnd = new scala.util.Random(42)
    val vals: Seq[java.lang.Double] = Seq.tabulate(5000) { i =>
      if (i % 97 == 0) null
      else {
        // exercise magnitudes across all three limbs: 1e-6 .. 1e11
        val mag = math.pow(10.0, rnd.nextInt(18) - 6)
        java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * mag)
      }
    }
    check(vals, groups = 7)
  }

  test("dsum past its 1e12 domain bound fails loudly; widedsum covers it") {
    // 2e12 overflows the DECIMAL(18,6) cast inside micros6 — the
    // contract is an ANSI error naming the cast, never a silent wrap
    val big = Seq((1, 2.0e12), (1, 1.0)).toDF("g", "v")
    val err = intercept[Exception] {
      big.groupBy($"g").agg(Cols.dsum($"v").as("s")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("cast") ||
      err.getMessage.toLowerCase.contains("overflow"))
    // widedsum is the documented escape hatch: exact over the full
    // DECIMAL(38,6) domain
    val got = big.groupBy($"g").agg(Cols.widedsum($"v").as("s"))
      .collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(2.0e12 + 1.0))
  }

  test("widedsum equals wide decimal sum within dsum's domain too") {
    val df = Seq((1, 1.0000005), (1, -2.675), (2, 1e11)).toDF("g", "v")
    val got = df.groupBy($"g").agg(Cols.widedsum($"v").as("s"))
      .orderBy($"g").collect().map(_.get(1)).toSeq
    val want = df.groupBy($"g").agg(wide($"v").as("s"))
      .orderBy($"g").collect().map(_.get(1)).toSeq
    assert(got == want)
  }

  test("davg equals wide-decimal average") {
    val df = Seq((1, 1.25), (1, 2.5), (1, 0.125), (2, -3.75)).toDF("g", "v")
    val got = df.groupBy($"g").agg(Cols.davg($"v").as("a"))
      .orderBy($"g").collect().map(_.getDouble(1)).toSeq
    val want = df.groupBy($"g")
      .agg((wide($"v") / count($"v")).as("a"))
      .orderBy($"g").collect().map(_.getDouble(1)).toSeq
    assert(got == want)
  }
}
