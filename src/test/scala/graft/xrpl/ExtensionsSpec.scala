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
    } finally {
      // restore the shared session for other suites
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
