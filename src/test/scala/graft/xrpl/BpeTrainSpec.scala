package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** The distributed BPE trainer must learn exactly the merge sequence a
  * sequential reference trainer learns — same pair counts, same
  * deterministic argmax (count DESC, pair ASC), same greedy
  * left-to-right non-overlapping merge application.
  */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  /** Sequential reference: classic BPE over a word-frequency dict. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var dict: Map[Vector[String], Long] = words.toSeq
      .map { case (w, f) => (w.map(_.toString).toVector, f) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((syms, f) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, rt), cnt) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r, l, rt, cnt))
        dict = dict.toSeq.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == l && s == rt)
              acc(acc.length - 1) = l + rt
            else acc += s
          }
          (acc.toVector, f)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def run(words: Map[String, Long], rounds: Int) = {
    import spark.implicits._
    val dict = words.toSeq.toDF("word", "freq")
    TextOps.bpeTrain(spark, dict, rounds)._1
  }

  test("merge sequence equals the sequential reference on a toy corpus") {
    // overlap stress: runs of a repeated character, a pair that is its
    // own continuation, and a learned symbol that re-merges next round
    val words = Map(
      "aaaa" -> 10L, "aaab" -> 6L, "banana" -> 8L, "bandana" -> 4L,
      "abab" -> 5L, "zz" -> 1L)
    assert(run(words, 6) === refBpe(words, 6))
  }

  test("merge sequence equals the sequential reference on sf0.001 docs") {
    val dict = TextOps.bpeWordDict(
      graft.Tables(spark, "/root/testdata/sf0.001", "documents"))
    val words = dict.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run(words, 5)
    assert(got === refBpe(words, 5))
    assert(got.length === 5)
  }

  test("boundary-wrapped replace equals the greedy merge fold") {
    // the oracle (TextOps.bpeOracleSql) rewrites dictionaries with
    // replace(enc, '|l||r|', '|lr|') over the '|s1||s2||…|' encoding;
    // SQL replace is left-to-right non-overlapping — exactly the
    // fold's semantics. Property-check the equivalence over every
    // adjacent pair of every symbolization a short alphabet generates,
    // including the self-overlap runs that break naive encodings.
    def fold(syms: Vector[String], l: String, r: String): Vector[String] = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { s =>
        if (acc.nonEmpty && acc.last == l && s == r)
          acc(acc.length - 1) = l + r
        else acc += s
      }
      acc.toVector
    }
    def viaReplace(syms: Vector[String], l: String, r: String)
        : Vector[String] = {
      val enc = syms.mkString("|", "||", "|")
      val out = enc.replace(s"|$l||$r|", s"|$l$r|")
      out.stripPrefix("|").stripSuffix("|").split("\\|\\|").toVector
    }
    val alphabet = Seq("a", "b", "aa", "ab", "ba", "aab")
    val words = for {
      n <- 2 to 4
      combo <- Seq.fill(n)(alphabet).flatten.combinations(n)
      word <- combo.permutations.take(24)
    } yield word.toVector
    var checked = 0
    words.foreach { syms =>
      syms.zip(syms.tail).distinct.foreach { case (l, r) =>
        assert(fold(syms, l, r) === viaReplace(syms, l, r),
          s"mismatch on $syms merging ($l,$r)")
        checked += 1
      }
    }
    assert(checked > 1000) // the property actually ran at breadth
  }
}
