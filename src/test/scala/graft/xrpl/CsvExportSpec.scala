package graft.xrpl

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xrpl.store.CsvExport

class CsvExportSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  lazy val tables: XrplTables =
    XrplTables.fromFiles(spark, XrplTables.fixturesPath)

  test("flatten: nested arrays become JSON strings, structs dotted paths") {
    import spark.implicits._
    val nested = Seq((1L, ("a", 2L), Seq("x", "y")))
      .toDF("id", "pair", "tags")
    val flat = CsvExport.flatten(nested)
    assert(flat.columns.toSet === Set("id", "pair._1", "pair._2", "tags"))
    val row = flat.head()
    assert(row.getAs[String]("tags") === """["x","y"]""")
    assert(row.getAs[String]("pair._1") === "a")
  }

  test("payments CSV round-trip preserves rows (S13)") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/payments"
    CsvExport.write(tables.payments.toDF(), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 182L)
    // nested balance-change lists exported as JSON strings
    assert(back.columns.contains("source_balance_changes"))
    val sample = back.filter(col("source_balance_changes").startsWith("["))
    assert(sample.count() > 0)
  }
}
