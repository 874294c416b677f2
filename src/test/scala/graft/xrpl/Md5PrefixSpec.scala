package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Md5Draws, Md5Prefix}

/** The codegen'd md5-prefix expressions must be bit-identical to the
  * declarative conv(substring(md5(...))) spelling they replace — that
  * equivalence is what keeps every DuckDB oracle of the hash-derived
  * gates unchanged.
  */
class Md5PrefixSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private def inputs = {
    import spark.implicits._
    (Seq("", "a", "0:1", "hello world", "ü§", "123456789:19") ++
      (0 until 500).map(i => s"$i:${i % 7}")).toDF("s")
  }

  test("md5_prefix_long equals conv(substring(md5, 1, 8), 16, 10)") {
    val bad = inputs
      .withColumn("fast", Md5Prefix.md5_prefix_long(col("s")))
      .withColumn("slow",
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
      .filter(col("fast") =!= col("slow"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("md5_prefix_long(_, 13) equals conv(substring(md5, 1, 13), 16, 10)") {
    val bad = inputs
      .withColumn("fast", Md5Prefix.md5_prefix_long(col("s"), 13))
      .withColumn("slow",
        conv(substring(md5(col("s")), 1, 13), 16, 10).cast("long"))
      .filter(col("fast") =!= col("slow"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("md5_draws equals the five conv(substring(md5, 1+6j, 6)) draws") {
    var df = inputs.withColumn("d", Md5Draws.md5_draws(col("s")))
    for (j <- 0 until Md5Draws.NumDraws)
      df = df.withColumn(s"slow$j",
        conv(substring(md5(col("s")), 1 + 6 * j, 6), 16, 10).cast("long"))
    val bad = df.filter((0 until Md5Draws.NumDraws)
      .map(j => element_at(col("d"), j + 1) =!= col(s"slow$j"))
      .reduce(_ || _))
    assert(bad.isEmpty, bad.collect().take(3).mkString(", "))
  }

  test("interpreted eval matches codegen (non-codegen path exercised)") {
    // force the interpreted path via a driver-side eval
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- Seq("", "x", "42:3", "some longer input string")) {
      val u = UTF8String.fromString(s)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(Md5Prefix.prefix(u, 8) === java.lang.Long.parseLong(
        hex.substring(0, 8), 16))
      assert(Md5Prefix.prefix(u, 13) === java.lang.Long.parseLong(
        hex.substring(0, 13), 16))
      val d = Md5Draws.draws(u)
      for (j <- 0 until Md5Draws.NumDraws)
        assert(d.getLong(j) === java.lang.Long.parseLong(
          hex.substring(6 * j, 6 * j + 6), 16))
    }
  }
}
