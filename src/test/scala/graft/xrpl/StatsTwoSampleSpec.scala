package graft.xrpl

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the round-14 ECDF/rank trio (CvM,
  * Anderson–Darling, Brunner–Munzel) and Tukey HSD. The DuckDB gate
  * only proves both ENGINES agree; these tests prove the formulas are
  * the textbook statistics: each gate runs on a small synthetic
  * events table (heavy ties on purpose) and must match a naive
  * double-precision reference within its micro/ppm quantization.
  */
class StatsTwoSampleSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  // deterministic tied samples: click (n=37) and view (m=41) on a
  // coarse value grid so tie blocks are exercised hard
  private val clicks: Seq[Double] =
    (1 to 37).map(i => ((i * 7) % 12).toDouble + 0.25)
  private val views: Seq[Double] =
    (1 to 41).map(i => ((i * 5) % 14).toDouble + 0.25)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-twosample").toString
    import spark.implicits._
    val rows =
      clicks.zipWithIndex.map { case (v, i) =>
        (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong,
          "click", v, "{}")
      } ++
      views.zipWithIndex.map { case (v, i) =>
        (1000L + i, Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong,
          "view", v, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def gate(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect().head

  // ECDF of a sample at x (P[X <= x])
  private def ecdf(s: Seq[Double])(x: Double): Double =
    s.count(_ <= x).toDouble / s.size

  test("stats_cvm_twosample matches the naive ECDF integral") {
    val n = clicks.size.toDouble; val m = views.size.toDouble
    val all = clicks ++ views
    // T = nm/N^2 * sum over all observations of (F1 - F2)^2
    val t = n * m / math.pow(n + m, 2) * all.map { x =>
      math.pow(ecdf(clicks)(x) - ecdf(views)(x), 2)
    }.sum
    val r = gate("stats_cvm_twosample")
    assert(r.getLong(0) == clicks.size && r.getLong(1) == views.size)
    assert(math.abs(r.getLong(2) - t * 1e6) <= 1,
      s"cvm_micro ${r.getLong(2)} vs naive ${t * 1e6}")
  }

  test("stats_anderson_darling matches the naive tie-blocked sum") {
    val n = clicks.size; val m = views.size; val bigN = n + m
    // tie-blocked: one term per distinct value except the largest
    val t = (clicks ++ views).distinct.sorted.dropRight(1).map { v =>
      val w = (clicks ++ views).count(_ == v)
      val mk = clicks.count(_ <= v).toDouble
      val k = (clicks ++ views).count(_ <= v).toDouble
      w * math.pow(mk * bigN - n * k, 2) / (k * (bigN - k))
    }.sum / (n.toDouble * m)
    val r = gate("stats_anderson_darling")
    // per-term truncating quantization: allow one micro unit per
    // distinct value of slack
    val slack = (clicks ++ views).distinct.size + 1
    assert(math.abs(r.getLong(2) - t * 1e6) <= slack,
      s"a2_micro ${r.getLong(2)} vs naive ${t * 1e6}")
  }

  test("stats_brunner_munzel matches the naive placement statistic") {
    val n = clicks.size; val m = views.size
    // p-hat = P(X < Y) + 0.5 P(X = Y)
    val pairs = for (x <- clicks; y <- views) yield
      (if (x < y) 1.0 else 0.0) + (if (x == y) 0.5 else 0.0)
    val pHat = pairs.sum / (n.toDouble * m)
    // midrank machinery, naive: combined and within-sample midranks
    def midranks(all: Seq[Double], s: Seq[Double]): Seq[Double] =
      s.map(x => all.count(_ < x) + (all.count(_ == x) + 1) / 2.0)
    val all = clicks ++ views
    val r1 = midranks(all, clicks); val r1w = midranks(clicks, clicks)
    val r2 = midranks(all, views); val r2w = midranks(views, views)
    def variance(rs: Seq[Double], ws: Seq[Double]): Double = {
      val d = rs.zip(ws).map { case (a, b) => a - b }
      val mean = d.sum / d.size
      d.map(x => math.pow(x - mean, 2)).sum / (d.size - 1)
    }
    val s1 = variance(r1, r1w); val s2 = variance(r2, r2w)
    val w = (r2.sum / m - r1.sum / n) /
      ((n + m) * math.sqrt((n * s1 + m * s2) / (n.toDouble * m * (n + m))) /
        math.sqrt(n.toDouble * m / (n + m)))
    // scipy spelling: W = nm (R2bar - R1bar) / ((n+m) sqrt(n S1 + m S2))
    val wScipy = n.toDouble * m * (r2.sum / m - r1.sum / n) /
      ((n + m) * math.sqrt(n * s1 + m * s2))
    val r = gate("stats_brunner_munzel")
    assert(math.abs(r.getLong(2) - pHat * 1e6) <= 1,
      s"p_hat_ppm ${r.getLong(2)} vs naive ${pHat * 1e6}")
    assert(math.abs(r.getLong(3) - s1 * 1e6) <= 1 &&
      math.abs(r.getLong(4) - s2 * 1e6) <= 1,
      s"variances (${r.getLong(3)}, ${r.getLong(4)}) vs ($s1, $s2)")
    // w_bm computed from quantized micros: tolerance from the
    // quantization, plus the naive float path's own rounding
    assert(math.abs(r.getDouble(5) - wScipy) < 1e-4,
      s"w_bm ${r.getDouble(5)} vs naive $wScipy (alt $w)")
  }

  test("stats_tukey_hsd matches the naive studentized range") {
    val rows = graft.SparkEntry.queries("stats_tukey_hsd")(spark, dir)
      .collect()
    assert(rows.length == 1) // one (click, view) pair in this corpus
    val r = rows.head
    // naive: cents-quantized values, MSW over both groups
    def cents(s: Seq[Double]) = s.map(v => math.round(v * 100).toDouble)
    val a = cents(clicks); val b = cents(views)
    def ss(s: Seq[Double]) = {
      val mean = s.sum / s.size
      s.map(x => math.pow(x - mean, 2)).sum
    }
    val dfw = (a.size - 1) + (b.size - 1)
    val msw = (ss(a) + ss(b)) / dfw
    val diff = math.abs(a.sum / a.size - b.sum / b.size)
    val q = diff / math.sqrt(msw / 2 * (1.0 / a.size + 1.0 / b.size))
    assert(r.getString(0) == "click" && r.getString(1) == "view")
    // the gate's per-group (n*q - s^2) div n floor loses < 1 cent^2
    // per group on the within-SS; propagate a loose tolerance
    assert(math.abs(r.getDouble(5) - q) < 1e-3,
      s"q_stat ${r.getDouble(5)} vs naive $q")
  }
}
