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
}
