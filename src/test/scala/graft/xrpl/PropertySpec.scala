package graft.xrpl

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import Scalars._

/** Property tests for the scalar domain library (SURVEY §5 rebuild
  * plan: round-trips and invariants for X1/X3/X5/X11/X13/X17).
  * Pure ScalaCheck Properties — sbt runs these as a test framework.
  */
object ScalarsProps extends Properties("Scalars") {

  property("X1: dropsToXrp round-trips exactly") =
    forAll(Gen.choose(0L, 100000000000000L)) { drops =>
      val xrp = dropsToXrp(drops.toString)
      val back = new java.math.BigDecimal(xrp)
        .multiply(new java.math.BigDecimal(1000000))
      back.stripTrailingZeros.toPlainString == drops.toString
    }

  private val intervalGen = Gen.oneOf(
    ("second", 15), ("minute", 5), ("minute", 15), ("hour", 1), ("hour", 4),
    ("day", 1), ("day", 3), ("day", 7), ("week", 1), ("month", 1),
    ("month", 3), ("year", 1))

  property("X13: alignment idempotent, never after input") =
    forAll(Gen.choose(1356998400L, 1900000000L), intervalGen) {
      case (t, (iv, mult)) =>
        val a = getAlignedTime(t, iv, mult)
        a <= t && getAlignedTime(a, iv, mult) == a
    }

  property("X13: 7-day alignment lands on Monday 00:00 (isoWeek)") =
    forAll(Gen.choose(1356998400L, 1900000000L)) { t =>
      val a = getAlignedTime(t, "day", 7)
      val dt = java.time.LocalDateTime.ofEpochSecond(a, 0, java.time.ZoneOffset.UTC)
      dt.getDayOfWeek == java.time.DayOfWeek.MONDAY &&
        dt.toLocalTime == java.time.LocalTime.MIDNIGHT
    }

  property("X17: toPrecision bounds relative error") =
    forAll(Gen.choose(1e-6, 1e9), Gen.choose(1, 10)) { (v, sig) =>
      val p = toPrecision(v, sig)
      math.abs(p - v) / v <= math.pow(10, -(sig - 1))
    }

  property("X11: hex decode round-trips UTF-8") =
    forAll(Gen.asciiPrintableStr.suchThat(_.nonEmpty)) { s =>
      val hex = s.getBytes("UTF-8").map("%02X".format(_)).mkString
      decodeHex(hex) == s
    }

  property("X11: base64 decode round-trips") =
    forAll(Gen.asciiPrintableStr.suchThat(_.nonEmpty)) { s =>
      val b64 = java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
      isBase64(b64) && decodeBase64(b64) == s
    }

  property("X5: quality = mantissa × 10^(offset−100), ±6 per XRP side") = {
    val hexDigits = Gen.listOfN(14, Gen.oneOf("0123456789ABCDEF".toSeq))
      .map(_.mkString)
    forAll(Gen.choose(90, 110), hexDigits) { (exp, mantissaHex) =>
      val bd = "0" * 48 + f"$exp%02X" + mantissaHex
      val mantissa = new java.math.BigDecimal(new java.math.BigInteger(mantissaHex, 16))
      val plain = parseQuality(bd, "USD", "EUR")
      Prop.all(
        plain.compareTo(mantissa.scaleByPowerOfTen(exp - 100)) == 0,
        parseQuality(bd, "XRP", "EUR").compareTo(plain.scaleByPowerOfTen(-6)) == 0,
        parseQuality(bd, "USD", "XRP").compareTo(plain.scaleByPowerOfTen(6)) == 0)
    }
  }

  property("X3: canonical ordering is input-order-independent") = {
    val cur = Gen.oneOf("XRP", "USD", "EUR", "BTC", "CNY")
    val iss = Gen.option(Gen.oneOf("rAlice", "rBob", "rCarol"))
    forAll(cur, iss, cur, iss) { (c1, i1, c2, i2) =>
      def canonical(bc: String, bi: Option[String], cc: String, ci: Option[String]) = {
        val k1 = (bc + bi.getOrElse("undefined")).toLowerCase
        val k2 = (cc + ci.getOrElse("undefined")).toLowerCase
        if (k2 < k1) ((cc, ci), (bc, bi)) else ((bc, bi), (cc, ci))
      }
      val k1 = (c1 + i1.getOrElse("undefined")).toLowerCase
      val k2 = (c2 + i2.getOrElse("undefined")).toLowerCase
      k1 == k2 || canonical(c1, i1, c2, i2) == canonical(c2, i2, c1, i1)
    }
  }
}
