package graft.xrpl

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Negative-path proof that the variance-envelope guards actually
  * FIRE. Under this session's ANSI=true (Spark 4 default) a
  * DECIMAL(38,0) multiply overflow throws on its own, but Spark's
  * decimal `div` silently WRAPS its long quotient past 2⁶³ — so the
  * r15 guards' post-div checks (`div ... IS NULL`, `div ... > 1e18`)
  * were respectively dead and wrap-evadable. The r16 guards bound the
  * numerator BEFORE the div (num > n·10¹⁸, a pure decimal compare);
  * these tests drive each gate over a tiny corpus engineered past its
  * envelope and assert the loud failure, plus a positive control that
  * ordinary values still flow.
  */
class GuardEnvelopeSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  /** Write an events dir with the given (event_type, ts, value) rows;
    * event_id follows row order (dailyOhlc's close is max_by event_id). */
  private def eventsDirAt(rows: Seq[(String, String, Double)]): String = {
    val d = Files.createTempDirectory("graft-guard").toString
    import spark.implicits._
    rows.zipWithIndex.map { case ((t, ts, v), i) =>
      (i.toLong, Timestamp.valueOf(ts), i.toLong, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def eventsDir(rows: Seq[(String, Double)]): String =
    eventsDirAt(rows.map { case (t, v) =>
      (t, "2024-01-01 00:00:00", v) })

  private def run(gate: String, dir: String) =
    graft.SparkEntry.queries(gate)(spark, dir).collect()

  // m = round(value·100) = 6e9 cents ⇒ per-group num = n·Σm² − (Σm)²
  // = 3.6e19 > n·1e18 — inside DECIMAL(38,0) (no ANSI multiply
  // throw), past the int64 quotient envelope the guards must enforce.
  private val overEnvelope = Seq(
    "click" -> 0.0, "click" -> 6e7, "view" -> 0.0, "view" -> 6e7)

  test("stats_tukey_hsd variance guard fires past the envelope") {
    val e = intercept[Exception] {
      run("stats_tukey_hsd", eventsDir(overEnvelope))
    }
    assert(e.getMessage.contains("int64 envelope"),
      s"wrong failure: ${e.getMessage}")
  }

  test("stats_bartlett variance guard fires past the envelope") {
    val e = intercept[Exception] {
      run("stats_bartlett", eventsDir(overEnvelope))
    }
    assert(e.getMessage.contains("micro-ln envelope"),
      s"wrong failure: ${e.getMessage}")
  }

  test("stats_grubbs is loud past the DECIMAL(38,0) numerator") {
    // devmax = max|n·m − S| ≈ 1.2e16 at m = 6e15 ⇒ (n−1)·devmax²·10⁶
    // ≈ 2.9e38 > 10³⁸: the ANSI decimal multiply must throw — the
    // symmetric-loudness claim the gate's scaladoc makes (DuckDB's
    // HUGEINT arithmetic errors on the same corpus).
    val e = intercept[Exception] {
      run("stats_grubbs", eventsDir(Seq(
        "click" -> 0.0, "click" -> 0.0, "click" -> 6e13)))
    }
    assert(e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      e.getMessage.contains("cannot be represented"),
      s"wrong failure: ${e.getMessage}")
  }

  test("ts_amihud_illiq envelope guard fires on a value-scale wrap") {
    // day 1: one 1-cent event (prev close 1, the divisor's pc);
    // day 2: -99999.99 then +100000.00 → close_c = 1e7 (max event_id)
    // while vol_c = Σcents = 1 — the divisor is one cent² and
    // |Δclose|·1e12 ≈ 1e19 > 2⁶³, exactly the silent-wrap shape the
    // r16 guard closes (9999999 > 9e6·pc·vol fires it).
    val e = intercept[Exception] {
      run("ts_amihud_illiq", eventsDirAt(Seq(
        ("click", "2024-01-01 00:00:00", 0.01),
        ("click", "2024-01-02 00:00:00", -99999.99),
        ("click", "2024-01-02 01:00:00", 100000.00))))
    }
    assert(e.getMessage.contains("pico envelope"),
      s"wrong failure: ${e.getMessage}")
  }

  test("ordinary values still flow through all three gates") {
    val dir = eventsDir(Seq(
      "click" -> 1.25, "click" -> 2.5, "click" -> 99.0,
      "view" -> 3.75, "view" -> 4.0, "view" -> 5.25))
    assert(run("stats_tukey_hsd", dir).nonEmpty)
    assert(run("stats_bartlett", dir).nonEmpty)
    val g = run("stats_grubbs", dir)
    assert(g.nonEmpty && g.forall(_.getAs[Long]("gcrit2_micro") > 0))
  }
}
