package graft.xrpl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must install the engine's SQL functions into a
  * fresh session via spark.sql.extensions.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions register the custom expressions as SQL functions") {
    // getOrCreate returns the active session (ignoring extensions), so
    // clear it, build a fresh session over the same SparkContext with
    // the extensions installed, and restore the shared one afterwards
    val base = SparkTest.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions()(_))
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT graft_simhash('the quick brown fox') AS h,
          |  graft_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
          |  element_at(graft_minhash_sig('abcdefghijklmnop', 4), 1) AS m,
          |  graft_simhash('the quick brown fox') =
          |    graft_simhash('the quick brown fox') AS stable
          |""".stripMargin).head()
      assert(row.getAs[Long]("d") === 4L + 10L + 18L)
      assert(row.getAs[String]("m").length === 8)
      assert(row.getAs[Boolean]("stable"))
      assert(row.getAs[Long]("h") ===
        graft.functions.SimHash.fingerprint(
          org.apache.spark.unsafe.types.UTF8String
            .fromString("the quick brown fox")))
      val row2 = spark.sql(
        """SELECT graft_md5_prefix('abc') AS p8,
          |  graft_md5_prefix('abc', 13) AS p13,
          |  element_at(graft_md5_draws('abc'), 1) AS d1,
          |  graft_jaro('martha', 'marhta') AS j,
          |  graft_jaro_winkler('martha', 'marhta') AS jw
          |""".stripMargin).head()
      // md5('abc') = 900150983cd24fb0d6963f7d28e17f72
      assert(row2.getAs[Long]("p8") === java.lang.Long.parseLong("90015098", 16))
      assert(row2.getAs[Long]("p13") ===
        java.lang.Long.parseLong("900150983cd24", 16))
      assert(row2.getAs[Long]("d1") === java.lang.Long.parseLong("900150", 16))
      assert(math.abs(row2.getAs[Double]("j") - 0.9444444444444445) < 1e-12)
      assert(math.abs(row2.getAs[Double]("jw") - 0.9611111111111111) < 1e-12)
    } finally {
      // restore the shared session for other suites
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
