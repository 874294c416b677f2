package graft.xrpl

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the codegen'd Catalyst expressions: each static
  * kernel must agree with an independent straightforward reference
  * implementation on arbitrary inputs.
  */
object ExpressionProps extends Properties("Expressions") {

  // ---------------------------------------------------------------
  // DotProductLong vs BigInt arithmetic (no overflow reference)
  // ---------------------------------------------------------------
  private val vecGen = Gen.listOfN(64, Gen.choose(-2000000L, 2000000L))

  property("dot product equals BigInt dot over quantized range") =
    forAll(vecGen, vecGen) { (a, b) =>
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray)
      val bd = new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray)
      val expect = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      expect.isValidLong &&
        graft.functions.DotProductLong.dot(ad, bd) == expect.toLong
    }

  // ---------------------------------------------------------------
  // MinHashSig vs a direct per-shingle min over md5 slices
  // ---------------------------------------------------------------
  // includes supplementary-plane code points (emoji, CJK-ext) so the
  // shingle boundaries are exercised across surrogate pairs
  private val cpGen: Gen[String] = Gen.frequency(
    (8, Gen.alphaNumChar.map(_.toString)),
    (2, Gen.const(" ")),
    (1, Gen.oneOf("😀", "🔥", "𣀊")))
  private val textGen = Gen.chooseNum(0, 60).flatMap(n =>
    Gen.listOfN(n, cpGen).map(_.mkString))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  private def refSig(text: String, n: Int): Option[Vector[String]] = {
    // code-point sliding windows (SQL substr semantics), not UTF-16
    val cps = text.codePoints().toArray
    val shingles = cps.sliding(8).filter(_.length == 8)
      .map(w => new String(w, 0, w.length)).toVector
    if (shingles.isEmpty) None
    else Some((0 until n).map { i =>
      shingles.map(s => md5hex(s"${i / 4}$s").substring((i % 4) * 8, (i % 4) * 8 + 8)).min
    }.toVector)
  }

  property("MinHashSig equals per-shingle md5-slice minima") =
    forAll(textGen, Gen.oneOf(2, 4, 6, 8)) { (text, n) =>
      val got = Option(
        graft.functions.MinHashSig.sig(UTF8String.fromString(text), n))
        .map(a => (0 until n).map(i => a.getUTF8String(i).toString).toVector)
      got == refSig(text, n)
    }

  // ---------------------------------------------------------------
  // SimHash vs a direct bit-vote reference
  // ---------------------------------------------------------------
  private def refSimhash(text: String): Long = {
    val votes = new Array[Int](16)
    text.split(" ", -1).foreach { tok =>
      val v = Integer.parseInt(md5hex(tok).substring(0, 4), 16)
      (0 until 16).foreach(j => votes(j) += (if (((v >> j) & 1) == 1) 1 else -1))
    }
    (0 until 16).map(j => if (votes(j) > 0) 1L << j else 0L).sum
  }

  property("SimHash equals direct bit-vote fingerprint") =
    forAll(textGen) { text =>
      graft.functions.SimHash.fingerprint(UTF8String.fromString(text)) ==
        refSimhash(text)
    }

  // ---------------------------------------------------------------
  // JaroSim vs an independently-written reference (list-functional
  // style, same pinned conventions: greedy window matching,
  // t = mismatches/2, (m/l1 + m/l2 + (m-t)/m)/3, boost > 0.7 only)
  // ---------------------------------------------------------------
  private def refJaro(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val taken = Array.fill(b.length)(false)
    val matchedA = a.indices.flatMap { i =>
      ((i - window).max(0) until ((i + window + 1).min(b.length)))
        .find(j => !taken(j) && a(i) == b(j))
        .map { j => taken(j) = true; i }
    }
    val m = matchedA.length
    if (m == 0) return 0.0
    val matchedB = b.indices.filter(taken)
    val t = matchedA.zip(matchedB).count { case (i, j) => a(i) != b(j) } / 2
    (m.toDouble / a.length + m.toDouble / b.length +
      (m - t).toDouble / m) / 3.0
  }

  private def refJw(a: String, b: String): Double = {
    val j = refJaro(a, b)
    if (j <= 0.7) j
    else {
      val p = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.length
      j + 0.1 * p * (1.0 - j)
    }
  }

  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 14)
    cs <- Gen.listOfN(n, Gen.oneOf("abcde XY".toSeq))
  } yield cs.mkString

  property("Jaro/Jaro-Winkler equal the independent reference") =
    forAll(wordGen, wordGen) { (a, b) =>
      val (ua, ub) = (UTF8String.fromString(a), UTF8String.fromString(b))
      graft.functions.JaroSim.jaro(ua, ub) == refJaro(a, b) &&
        graft.functions.JaroSim.jaroWinkler(ua, ub) == refJw(a, b)
    }

  property("Jaro-Winkler invariants: bounds, symmetry, boost direction") =
    forAll(wordGen, wordGen) { (a, b) =>
      val (ua, ub) = (UTF8String.fromString(a), UTF8String.fromString(b))
      val j = graft.functions.JaroSim.jaro(ua, ub)
      val w = graft.functions.JaroSim.jaroWinkler(ua, ub)
      j >= 0.0 && w <= 1.0 && w >= j &&
        w == graft.functions.JaroSim.jaroWinkler(ub, ua) &&
        (j <= 0.7 || a.isEmpty || b.isEmpty || a(0) != b(0) || w > j ||
          j == 1.0)
    }

  // ---------------------------------------------------------------
  // LcsLen (rolling two-row DP kernel) vs the textbook full matrix
  // ---------------------------------------------------------------
  // small token alphabet so matches are dense (the hard case)
  private val toksGen: Gen[List[String]] = Gen.chooseNum(0, 40).flatMap(
    n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "xy")))

  private def refLcs(a: List[String], b: List[String]): Long = {
    val dp = Array.fill(a.size + 1, b.size + 1)(0L)
    for (i <- 1 to a.size; j <- 1 to b.size)
      dp(i)(j) = math.max(
        math.max(dp(i - 1)(j), dp(i)(j - 1)),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 1L else 0L))
    dp(a.size)(b.size)
  }

  private def arr(xs: List[String]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      xs.map(UTF8String.fromString).toArray[Any])

  property("LcsLen equals the textbook DP; symmetric; bounded") =
    forAll(toksGen, toksGen) { (a, b) =>
      val v = graft.functions.LcsLen.lcs(arr(a), arr(b))
      v == refLcs(a, b) &&
        v == graft.functions.LcsLen.lcs(arr(b), arr(a)) &&
        v <= math.min(a.size, b.size)
    }

  // ---------------------------------------------------------------
  // ChrfClip vs a naive per-gram multiset-min, across code points
  // ---------------------------------------------------------------
  private def refClip(a: String, b: String, n: Int): Long = {
    def grams(s: String): Map[String, Long] = {
      val cps = s.codePointCount(0, s.length)
      (0 until math.max(0, cps - n + 1)).map { i =>
        val off = s.offsetByCodePoints(0, i)
        s.substring(off, s.offsetByCodePoints(off, n))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    val ga = grams(a); val gb = grams(b)
    ga.map { case (g, c) => math.min(c, gb.getOrElse(g, 0L)) }.sum
  }

  property("ChrfClip equals the naive gram multiset-min (n = 2, 3)") =
    forAll(textGen, textGen) { (a, b) =>
      val (ua, ub) = (UTF8String.fromString(a), UTF8String.fromString(b))
      graft.functions.ChrfClip.clip(ua, ub, 2) == refClip(a, b, 2) &&
        graft.functions.ChrfClip.clip(ua, ub, 3) == refClip(a, b, 3) &&
        graft.functions.ChrfClip.clip(ua, ua, 2) ==
          math.max(0, a.codePointCount(0, a.length) - 1)
    }

  // Missing-key path: every left gram is absent from right (disjoint
  // alphabets) yet occurs with nonzero count on the left — the case
  // the r14 dead null-guard pretended to handle (a java.util get on a
  // Scala Long map unboxes a missing key's null to 0L, so `!= null`
  // was always-true; clip stayed correct only because min(c, 0) = 0).
  private val leftAlphaGen: Gen[String] =
    Gen.chooseNum(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val rightAlphaGen: Gen[String] =
    Gen.chooseNum(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('x', 'y', 'z')).map(_.mkString))

  property("ChrfClip is 0 when every left gram is absent from right") =
    forAll(leftAlphaGen, rightAlphaGen) { (a, b) =>
      val (ua, ub) = (UTF8String.fromString(a), UTF8String.fromString(b))
      graft.functions.ChrfClip.clip(ua, ub, 2) == 0L &&
        graft.functions.ChrfClip.clip(ua, ub, 3) == 0L &&
        // and grafting a shared prefix onto both counts ONLY the
        // shared-prefix grams plus at most one junction gram per side
        graft.functions.ChrfClip.clip(
          UTF8String.fromString("qq" + a),
          UTF8String.fromString("qq" + b), 2) >= 1L
    }
}
