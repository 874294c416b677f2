package graft.xrpl

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroSim

/** Pinned values and invariants for the Jaro / Jaro-Winkler codegen
  * expressions. The pinned doubles are DuckDB's jaro_similarity /
  * jaro_winkler_similarity outputs for the same pairs (the er_* gates
  * hash-compare the whole dictionary against that oracle; these keep
  * the kernel honest at unit granularity).
  */
class JaroWinklerSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def u(s: String) = UTF8String.fromString(s)

  test("pinned reference values (bit-exact with the DuckDB oracle)") {
    assert(JaroSim.jaro(u("martha"), u("marhta")) === 0.9444444444444445)
    assert(JaroSim.jaroWinkler(u("martha"), u("marhta")) === 0.9611111111111111)
    assert(JaroSim.jaro(u("abc"), u("abc")) === 1.0)
    assert(JaroSim.jaroWinkler(u("abc"), u("abc")) === 1.0)
    // either side empty → 0.0, including both (DuckDB's convention)
    assert(JaroSim.jaro(u(""), u("")) === 0.0)
    assert(JaroSim.jaroWinkler(u(""), u("abc")) === 0.0)
    // disjoint alphabets → no matches → 0.0, no winkler boost
    assert(JaroSim.jaroWinkler(u("abc"), u("xyz")) === 0.0)
    // boost only above 0.7, prefix capped at 4
    val j = JaroSim.jaro(u("prefixes"), u("prefixed"))
    val w = JaroSim.jaroWinkler(u("prefixes"), u("prefixed"))
    assert(j > 0.7 && w === j + 0.1 * 4 * (1.0 - j))
  }

  test("invariants: symmetry, bounds, codegen ≡ kernel") {
    import spark.implicits._
    val words = Seq("red bolt", "red belt", "blue bolt", "small ring",
      "ring", "r", "", "old anvil", "anvil old", "aabbcc", "ccbbaa")
    for (a <- words; b <- words) {
      val s = JaroSim.jaroWinkler(u(a), u(b))
      assert(s >= 0.0 && s <= 1.0, s"out of bounds: $a / $b -> $s")
      assert(s === JaroSim.jaroWinkler(u(b), u(a)), s"asymmetric: $a / $b")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
    // the codegen'd column path must equal the static kernel
    val df = words.flatMap(a => words.map(b => (a, b))).toDF("a", "b")
      .select(col("a"), col("b"),
        JaroSim.jaro(col("a"), col("b")).as("j"),
        JaroSim.jaroWinkler(col("a"), col("b")).as("w"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) === JaroSim.jaro(u(r.getString(0)), u(r.getString(1))))
      assert(r.getDouble(3) === JaroSim.jaroWinkler(u(r.getString(0)), u(r.getString(1))))
    }
  }
}
