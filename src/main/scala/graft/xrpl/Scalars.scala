package graft.xrpl

import java.math.{BigDecimal => JBigDecimal, BigInteger, MathContext, RoundingMode}
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** The scalar domain library (SURVEY.md §2.8, X1–X17) as pure
  * functions. Each cites the reference behavior it reproduces.
  */
object Scalars {

  /** X1: drops→XRP divisor (lib/ledgerParser/exchanges.js:3). */
  val XrpAdjust = new JBigDecimal(1000000)

  /** X2: ripple epoch offset (lib/ledgerParser/index.js:5). */
  val EpochOffset = 946684800L

  /** Division precision for rates — mirrors bignumber.js's default
    * 20-significant-digit division (lib/ledgerParser/exchanges.js:59-98).
    */
  val RateMc = new MathContext(20)

  /** Normalized decimal string: exact value, no trailing zeros, plain
    * notation (bignumber.js toString for the value ranges in play).
    */
  def fmt(bd: JBigDecimal): String = {
    val s = bd.stripTrailingZeros
    // stripTrailingZeros turns 100 into 1E+2; toPlainString undoes that.
    s.toPlainString
  }

  def dec(s: String): JBigDecimal = new JBigDecimal(s)

  /** X1: drops string → XRP decimal string (exact, scale ≤ 6). */
  def dropsToXrp(drops: String): String =
    fmt(dec(drops).divide(XrpAdjust))

  def dropsToXrpBd(drops: String): JBigDecimal = dec(drops).divide(XrpAdjust)

  /** X2: ripple-epoch → unix seconds, applied only when the value is
    * below the offset ("only works until 2030",
    * lib/ledgerParser/index.js:37-40).
    */
  def rippleToUnix(t: Long): Long = if (t < EpochOffset) t + EpochOffset else t

  /** X5: BookDirectory quality decode
    * (lib/ledgerParser/quality.js:5-19): last 16 hex chars = 8-bit
    * exponent (−100 biased) + 56-bit mantissa; ±6 decimal shift per XRP
    * side.
    */
  def parseQuality(bookDirectory: String, paysCurrency: String, getsCurrency: String): JBigDecimal = {
    val qualityHex = bookDirectory.substring(bookDirectory.length - 16)
    val mantissa = new BigInteger(qualityHex.substring(2), 16)
    val offset = Integer.parseInt(qualityHex.substring(0, 2), 16) - 100
    val numeratorShift = if (paysCurrency == "XRP") -6 else 0
    val denominatorShift = if (getsCurrency == "XRP") -6 else 0
    val shift = numeratorShift - denominatorShift
    new JBigDecimal(mantissa).scaleByPowerOfTen(offset + shift)
  }

  /** X17: JS Number.prototype.toPrecision(n) equivalent — n significant
    * digits (lib/aggregation/fees.js:266-268 et al).
    */
  def toPrecision(v: Double, sig: Int): Double =
    if (v == 0 || v.isNaN || v.isInfinite) v
    else new JBigDecimal(v).round(new MathContext(sig, RoundingMode.HALF_UP)).doubleValue()

  private val isoFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'").withZone(ZoneOffset.UTC)

  /** X13: smoment default format — ISO-8601 UTC with literal Z
    * (lib/smoment.js:11, 'YYYY-MM-DDTHH:mm:ss[Z]').
    */
  def isoFormat(unixSeconds: Long): String =
    isoFmt.format(Instant.ofEpochSecond(unixSeconds))

  private val hbaseFmt =
    DateTimeFormatter.ofPattern("yyyyMMddHHmmss").withZone(ZoneOffset.UTC)

  /** X13: rowkey time format (lib/utils.js:9-16). */
  def formatTime(unixSeconds: Long): String =
    hbaseFmt.format(Instant.ofEpochSecond(unixSeconds))

  /** Inverse-timestamp rowkey idiom (lib/utils.js:36-40). */
  def reverseTimestamp(unixSeconds: Long): Long =
    70000000000000L - formatTime(unixSeconds).toLong

  /** X13: zero-padded number (lib/utils.js:46-52). */
  def padNumber(num: Long, size: Int = 10): String = {
    var s = num.toString
    while (s.length < size) s = "0" + s
    s
  }

  /** X13: getAlignedTime (lib/utils.js:66-130) — align a timestamp to
    * the start of its (interval × multiple) bucket. day-multiples are
    * anchored to 2013-01-01; 7-day = ISO week (Monday).
    */
  def getAlignedTime(unixSeconds: Long, interval: String, multiple0: Int = 1): Long = {
    var multiple = if (multiple0 <= 0) 1 else multiple0
    var iv = if (interval != null && interval.length >= 3) interval.substring(0, 3) else ""
    if (iv == "day" && multiple == 7) { iv = "wee"; multiple = 1 }

    val t = LocalDateTime.ofEpochSecond(unixSeconds, 0, ZoneOffset.UTC)
    val aligned: LocalDateTime = iv match {
      case "sec" =>
        val base = t.truncatedTo(ChronoUnit.SECONDS)
        if (multiple > 1) base.minusSeconds(base.getSecond % multiple) else base
      case "min" =>
        val base = t.truncatedTo(ChronoUnit.MINUTES)
        if (multiple > 1) base.minusMinutes(base.getMinute % multiple) else base
      case "hou" =>
        val base = t.truncatedTo(ChronoUnit.HOURS)
        if (multiple > 1) base.minusHours(base.getHour % multiple) else base
      case "day" =>
        val anchor = LocalDate.of(2013, 1, 1).atStartOfDay()
        val days =
          if (multiple == 1) 0
          else {
            // diff in whole hours / 24, floored — matches
            // moment.diff(...,'hours')/24 then Math.floor (utils.js:105-110)
            val diffHours = ChronoUnit.HOURS.between(anchor, t)
            val diff = diffHours.toDouble / 24.0
            if (diff < 0) multiple - ((0 - math.floor(diff)).toLong % multiple)
            else math.floor(diff).toLong % multiple
          }
        t.toLocalDate.atStartOfDay().minusDays(days)
      case "wee" =>
        // startOf('isoWeek') = Monday 00:00
        val monday = t.toLocalDate.minusDays((t.getDayOfWeek.getValue - 1).toLong)
        monday.atStartOfDay()
      case "mon" =>
        val base = t.toLocalDate.withDayOfMonth(1).atStartOfDay()
        // moment month() is 0-based (utils.js:122)
        if (multiple > 1) base.minusMonths((base.getMonthValue - 1) % multiple) else base
      case "yea" =>
        val base = LocalDate.of(t.getYear, 1, 1).atStartOfDay()
        if (multiple > 1) base.minusYears(base.getYear % multiple) else base
      case _ => t
    }
    aligned.toEpochSecond(ZoneOffset.UTC)
  }

  // --- X11: hex / base64 memo decoding (lib/ledgerParser/memos.js) ---

  val hexMatch = "^(0x)?[0-9A-Fa-f]+$".r
  val base64Match =
    "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})([=]{1,2})?$".r

  def isHex(s: String): Boolean = hexMatch.pattern.matcher(s).matches()
  def isBase64(s: String): Boolean = base64Match.pattern.matcher(s).matches()

  /** Strict UTF-8 decode — throws on malformed input, mirroring
    * sjcl.codec.utf8String.fromBits failure (memos.js:100-106).
    */
  private def strictUtf8(bytes: Array[Byte]): String = {
    val decoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** Hex → UTF-8 string; throws if not decodable. */
  def decodeHex(data0: String): String = {
    val data = if (data0.startsWith("0x")) data0.substring(2) else data0
    require(data.length % 2 == 0, "odd-length hex")
    val bytes = new Array[Byte](data.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = Integer.parseInt(data.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    strictUtf8(bytes)
  }

  /** Base64 → UTF-8 string; throws if not decodable. */
  def decodeBase64(data: String): String =
    strictUtf8(java.util.Base64.getDecoder.decode(data))

  /** Try hex first, then base64 (memos.js:28-38); returns the decoded
    * string + encoding name, or None if neither applies/decodes.
    */
  def tryDecode(s: String): Option[(String, String)] = {
    if (isHex(s)) {
      try return Some((decodeHex(s), "hex"))
      catch { case _: Exception => return None }
    }
    if (isBase64(s)) {
      try return Some((decodeBase64(s), "base64"))
      catch { case _: Exception => return None }
    }
    None
  }

  /** X15: hex tx-hash validation (api/routes/getTransactions.js:80-84). */
  def isValidHash(s: String): Boolean = s != null && s.matches("^[0-9A-Fa-f]{64}$")
}
