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

  test("length-prefixed cells kill the sentinel/boundary collisions") {
    import spark.implicits._
    // a cell whose VALUE is a lone NUL must not collide with NULL
    // (the old rendering used U+0000 as the null sentinel)
    val asNul  = Seq((1L, "\u0000")).toDF("id", "s")
    val asNull = Seq((1L, null: String)).toDF("id", "s")
    assert(Verify.digestOf(asNul) != Verify.digestOf(asNull))
    // nor can a literal "n" (the new sentinel) collide with NULL
    val asN = Seq((1L, "n")).toDF("id", "s")
    assert(Verify.digestOf(asN) != Verify.digestOf(asNull))
    // content containing the old U+0001 separator cannot shift a
    // column boundary: ("a\u0001", "b") vs ("a", "\u0001b")
    val l = Seq(("a\u0001", "b")).toDF("x", "y")
    val r = Seq(("a", "\u0001b")).toDF("x", "y")
    assert(Verify.digestOf(l) != Verify.digestOf(r))
    // adjacent cells cannot trade a suffix/prefix: ("ab","c") vs ("a","bc")
    val l2 = Seq(("ab", "c")).toDF("x", "y")
    val r2 = Seq(("a", "bc")).toDF("x", "y")
    assert(Verify.digestOf(l2) != Verify.digestOf(r2))
  }

  test("canonical write form: one part, sorted columns, total row order") {
    import spark.implicits._
    val base = Seq((3L, "c", 1.0), (1L, "a", -2.0), (2L, null, 0.5),
      (1L, "b", 7.0)).toDF("id", "s", "v").repartition(5)
    val c = Verify.canonical(base.select(col("v"), col("id"), col("s")))
    // fixed column order (sorted by name) regardless of input order
    assert(c.columns.toSeq == Seq("id", "s", "v"))
    // exactly one partition
    assert(c.rdd.getNumPartitions == 1)
    // rows in total canonical order, independent of input layout
    val rows = c.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq ==
      Seq((1L, "a"), (1L, "b"), (2L, null), (3L, "c")))
    // and the digest is unchanged by canonicalization
    assert(Verify.digestOf(c) == Verify.digestOf(base))
  }

  test("baseline dispatch: each SF dir maps to its own committed digests") {
    assert(Verify.baselineNameFor("/root/testdata/sf0.001")
      == "DIGESTS_sf0.001.json")
    assert(Verify.baselineNameFor("/root/testdata/sf0.01/")
      == "DIGESTS_sf0.01.json")
    assert(Verify.baselineNameFor("/root/testdata/sf0.1")
      == "DIGESTS_sf0.1.json")
  }

  test("canonical degrades gracefully on unsortable (map) columns") {
    import spark.implicits._
    val m = Seq((1L, Map("k" -> 1)), (2L, Map("j" -> 2)))
      .toDF("id", "m").repartition(3)
    val c = Verify.canonical(m)
    assert(c.rdd.getNumPartitions == 1)
    // sorts by the orderable column only; still content-complete
    assert(c.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }
}
