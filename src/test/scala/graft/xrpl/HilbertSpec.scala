package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hilbert

/** The Hilbert key must be (a) a bijection on the grid, (b) a TRUE
  * Hilbert curve — each key increment moves exactly one unit step in
  * (x, y); that adjacency property is the entire reason the layout
  * beats Morton for min/max file skipping — and (c) the codegen'd
  * expression must agree with the plain-Scala reference everywhere.
  */
class HilbertSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("xy2d is a unit-step bijection on the full 64x64 grid (bits=6)") {
    val bits = 6
    val n = 1 << bits
    val pos = new Array[(Long, Long)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = Hilbert.xy2d(bits, x, y)
      assert(pos(d.toInt) == null, s"duplicate key $d at ($x,$y)")
      pos(d.toInt) = (x.toLong, y.toLong)
    }
    for (d <- 0 until n * n - 1) {
      val (x1, y1) = pos(d)
      val (x2, y2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step $d -> ${d + 1}: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("codegen'd HilbertKey equals the Scala reference (bits=8)") {
    import spark.implicits._
    val cells = (0 until 2000).map { i =>
      val x = (i * 2654435761L) & 255L
      val y = (i * 40503L + 17) & 255L
      (x, y, Hilbert.xy2d(8, x, y))
    }
    val bad = cells.toDF("x", "y", "want")
      .withColumn("got", Hilbert.hilbertKey(col("x"), col("y")))
      .filter(col("got") =!= col("want"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("SQL CTE mirror computes the same key (bits=8, via Spark SQL)") {
    import spark.implicits._
    val cells = (0 until 512).map { i =>
      val x = (i * 2654435761L) & 255L
      val y = (i * 48271L + 5) & 255L
      (x, y, Hilbert.xy2d(8, x, y))
    }
    cells.toDF("hx", "hy", "want").createOrReplaceTempView("hil_in")
    // The mirror is integer CASE arithmetic except the `//` integer
    // division; Spark spells that `div` — the one-token rewrite lets
    // the identical round recurrence run in both engines.
    val (ctes, fin) = Hilbert.hilbertCtes("hil_in", Seq("want"))
    val sql = s"WITH ${ctes.replace("//", "div")} " +
      s"SELECT want, hd FROM $fin WHERE want <> hd"
    assert(spark.sql(sql).isEmpty)
  }
}
