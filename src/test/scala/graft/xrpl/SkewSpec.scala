package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Skew

/** Salted join / aggregation equivalence: salting only spreads the
  * shuffle; results must equal the unsalted plan.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("saltedJoin equals plain join on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val dim = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), factor = 8)

    assert(salted.count() === plain.count())
    val a = plain.groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = salted.groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("saltedAgg equals direct aggregation") {
    import spark.implicits._
    val df = spark.range(5000)
      .select(when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
        (col("id") % 13).as("v"))
    val direct = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(df, Seq("k"), factor = 8,
      partial = Seq("p_total" -> sum(col("v")), "p_n" -> count(lit(1))),
      combine = Seq(sum(col("p_total")).as("total"), sum(col("p_n")).as("n")))
    val a = direct.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
