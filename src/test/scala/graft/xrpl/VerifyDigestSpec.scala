package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.Verify

/** The self-adjudication digest (Verify.digestOf) must be a function
  * of the result's CONTENT only: invariant to row order, partition
  * layout and column order, while distinguishing the near-miss cases
  * a sloppy rendering would conflate (null vs "null", value moved
  * between columns, binary payload bytes).
  */
class VerifyDigestSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import org.apache.spark.sql.functions._

  test("digest is invariant to row order, partitioning and column order") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, null, 2.0))
      .toDF("id", "s", "v")
    val d0 = Verify.digestOf(base)
    assert(d0.endsWith("-3"))
    // row order / partition layout
    assert(Verify.digestOf(base.orderBy(desc("id"))) == d0)
    assert(Verify.digestOf(base.repartition(7)) == d0)
    assert(Verify.digestOf(base.coalesce(1)) == d0)
    // column order (digest sorts columns by name)
    assert(Verify.digestOf(base.select(col("v"), col("id"), col("s")))
      == d0)
  }

  test("digest distinguishes the near-miss renderings") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, null)).toDF("id", "s")
    val d0 = Verify.digestOf(base)
    // null vs the string "null"
    val litNull = Seq((1L, "a"), (2L, "null")).toDF("id", "s")
    assert(Verify.digestOf(litNull) != d0)
    // a changed value
    assert(Verify.digestOf(Seq((1L, "a"), (2L, "x")).toDF("id", "s"))
      != d0)
    // swapped column CONTENT under the same sorted-column names
    val swapped = Seq(("a", 1L), (null, 2L)).toDF("id", "s")
    assert(Verify.digestOf(swapped) != d0)
    // a dropped row
    assert(Verify.digestOf(base.limit(1)) != d0)
  }

  test("binary columns digest by bytes; empty results are the zero digest") {
    import spark.implicits._
    val b1 = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "b")
    val b2 = Seq((1L, Array[Byte](1, 2, 4))).toDF("id", "b")
    assert(Verify.digestOf(b1) != Verify.digestOf(b2))
    assert(Verify.digestOf(b1.filter(col("id") < 0)) == "0-0-0")
  }
}
