package graft.xrpl.codec

import java.io.ByteArrayOutputStream
import java.math.BigInteger
import java.security.MessageDigest

import com.fasterxml.jackson.databind.JsonNode

import graft.xrpl.Json

/** X12: the XRPL canonical binary codec (tx serialization + hashing),
  * re-implemented from the PUBLIC serialization spec
  * (xrpl.org/serialization.html; the reference consumes it through
  * ripple-binary-codec — lib/validations.js and the api routes).
  *
  * Scope: every field/type the transaction surface uses — UInt16/32,
  * Hash128/256, Amount (XRP drops and IOU mantissa/exponent form),
  * Blob (VL-encoded), AccountID (base58check), nested STObject/STArray
  * (memos, signers) and PathSet. Fields serialize in canonical
  * (type code, field code) order; a transaction's ID is
  * SHA512-half over the TXN-prefixed blob.
  *
  * Golden-tested end-to-end in BinaryCodecSpec: the computed hash must
  * equal the `hash` carried by EVERY transaction of the bundled
  * reference mock ledgers (933 transactions across 7 tx types) — the
  * strongest available oracle for a codec DuckDB cannot express.
  */
object BinaryCodec {

  /** Field registry: name → (type code, field code). The subset of the
    * public definitions the transaction surface uses; unknown fields
    * fail loudly rather than serializing wrong.
    */
  val Fields: Map[String, (Int, Int)] = Map(
    // UInt16 (1)
    "TransactionType" -> (1, 2),
    "SignerWeight" -> (1, 3),
    // UInt32 (2)
    "Flags" -> (2, 2),
    "SourceTag" -> (2, 3),
    "Sequence" -> (2, 4),
    "Expiration" -> (2, 10),
    "TransferRate" -> (2, 11),
    "DestinationTag" -> (2, 14),
    "QualityIn" -> (2, 20),
    "QualityOut" -> (2, 21),
    "OfferSequence" -> (2, 25),
    "LastLedgerSequence" -> (2, 27),
    "SetFlag" -> (2, 33),
    "ClearFlag" -> (2, 34),
    "SignerQuorum" -> (2, 35),
    "CancelAfter" -> (2, 36),
    "FinishAfter" -> (2, 37),
    // Hash128 (4)
    "EmailHash" -> (4, 1),
    // Hash256 (5)
    "InvoiceID" -> (5, 17),
    "Channel" -> (5, 22),
    "CheckID" -> (5, 24),
    // Amount (6)
    "Amount" -> (6, 1),
    "Balance" -> (6, 2),
    "LimitAmount" -> (6, 3),
    "TakerPays" -> (6, 4),
    "TakerGets" -> (6, 5),
    "Fee" -> (6, 8),
    "SendMax" -> (6, 9),
    "DeliverMin" -> (6, 10),
    // Blob (7)
    "PublicKey" -> (7, 1),
    "MessageKey" -> (7, 2),
    "SigningPubKey" -> (7, 3),
    "TxnSignature" -> (7, 4),
    "Signature" -> (7, 6),
    "Domain" -> (7, 7),
    "MemoType" -> (7, 12),
    "MemoData" -> (7, 13),
    "MemoFormat" -> (7, 14),
    // AccountID (8)
    "Account" -> (8, 1),
    "Owner" -> (8, 2),
    "Destination" -> (8, 3),
    "RegularKey" -> (8, 8),
    // STObject (14)
    "CreatedNode" -> (14, 3),
    "DeletedNode" -> (14, 4),
    "ModifiedNode" -> (14, 5),
    "PreviousFields" -> (14, 6),
    "FinalFields" -> (14, 7),
    "NewFields" -> (14, 8),
    "Memo" -> (14, 10),
    "SignerEntry" -> (14, 11),
    "Signer" -> (14, 16),
    // STArray (15)
    "Signers" -> (15, 3),
    "SignerEntries" -> (15, 4),
    "AffectedNodes" -> (15, 8),
    "Memos" -> (15, 9),
    // PathSet (18)
    "Paths" -> (18, 1),
    // metadata surface (§ meta codec): UInt8 (16), UInt64 (3),
    // Hash160 (17) and the ledger-entry fields
    "LedgerEntryType" -> (1, 1),
    "TransactionResult" -> (16, 3),
    "TransactionIndex" -> (2, 28),
    "PreviousTxnLgrSeq" -> (2, 5),
    "OwnerCount" -> (2, 13),
    "SettleDelay" -> (2, 39),
    "PreviousTxnID" -> (5, 5),
    "LedgerIndex" -> (5, 6),
    "RootIndex" -> (5, 8),
    "AccountTxnID" -> (5, 9),
    "BookDirectory" -> (5, 16),
    "IndexNext" -> (3, 1),
    "IndexPrevious" -> (3, 2),
    "BookNode" -> (3, 3),
    "OwnerNode" -> (3, 4),
    "ExchangeRate" -> (3, 6),
    "LowNode" -> (3, 7),
    "HighNode" -> (3, 8),
    "LowLimit" -> (6, 6),
    "HighLimit" -> (6, 7),
    "DeliveredAmount" -> (6, 18),
    "TakerPaysCurrency" -> (17, 1),
    "TakerPaysIssuer" -> (17, 2),
    "TakerGetsCurrency" -> (17, 3),
    "TakerGetsIssuer" -> (17, 4))

  /** LedgerEntryType name → UInt16 code (the type's ASCII letter). */
  val LedgerEntryTypes: Map[String, Int] = Map(
    "AccountRoot" -> 'a', "DirectoryNode" -> 'd', "Offer" -> 'o',
    "RippleState" -> 'r', "Escrow" -> 'u', "PayChannel" -> 'x',
    "SignerList" -> 'S', "Ticket" -> 'T', "Check" -> 'C',
    "DepositPreauth" -> 'p', "LedgerHashes" -> 'h', "Amendments" -> 'f',
    "FeeSettings" -> 's').map { case (k, v) => k -> v.toInt }

  /** Engine result name → UInt8 code (public TER registry subset). */
  val ResultCodes: Map[String, Int] = Map(
    "tesSUCCESS" -> 0, "tecCLAIM" -> 100, "tecPATH_PARTIAL" -> 101,
    "tecUNFUNDED_ADD" -> 102, "tecUNFUNDED_OFFER" -> 103,
    "tecUNFUNDED_PAYMENT" -> 104, "tecFAILED_PROCESSING" -> 105,
    "tecDIR_FULL" -> 121, "tecINSUF_RESERVE_LINE" -> 122,
    "tecINSUF_RESERVE_OFFER" -> 123, "tecNO_DST" -> 124,
    "tecNO_DST_INSUF_XRP" -> 125, "tecNO_LINE_INSUF_RESERVE" -> 126,
    "tecNO_LINE_REDUNDANT" -> 127, "tecPATH_DRY" -> 128,
    "tecUNFUNDED" -> 129, "tecNO_ISSUER" -> 133)

  /** Transaction type name → UInt16 code (public registry subset). */
  val TxTypes: Map[String, Int] = Map(
    "Payment" -> 0, "EscrowCreate" -> 1, "EscrowFinish" -> 2,
    "AccountSet" -> 3, "EscrowCancel" -> 4, "SetRegularKey" -> 5,
    "OfferCreate" -> 7, "OfferCancel" -> 8, "SignerListSet" -> 12,
    "PaymentChannelCreate" -> 13, "PaymentChannelFund" -> 14,
    "PaymentChannelClaim" -> 15, "CheckCreate" -> 16, "CheckCash" -> 17,
    "CheckCancel" -> 18, "DepositPreauth" -> 19, "TrustSet" -> 20,
    "AccountDelete" -> 21, "TicketCreate" -> 10)

  private val Alphabet =
    "rpshnaf39wBUDNEGHJKLM4PQRST7VWXYZ2bcdeCg65jkm8oFqi1tuvAxyz"

  /** Base58check-decode a classic address to its 20-byte AccountID. */
  def decodeAccountId(addr: String): Array[Byte] = {
    var acc = BigInteger.ZERO
    val base = BigInteger.valueOf(58)
    addr.foreach { c =>
      val i = Alphabet.indexOf(c)
      require(i >= 0, s"bad base58 char '$c' in $addr")
      acc = acc.multiply(base).add(BigInteger.valueOf(i))
    }
    val leadingZeros = addr.takeWhile(_ == Alphabet(0)).length
    val digits = acc.toByteArray.dropWhile(_ == 0)
    val full = Array.fill[Byte](leadingZeros)(0) ++ digits
    require(full.length == 25, s"decoded length ${full.length} for $addr")
    val (payload, checksum) = full.splitAt(21)
    val sha = MessageDigest.getInstance("SHA-256")
    val check = sha.digest(sha.digest(payload)).take(4)
    require(java.util.Arrays.equals(check, checksum), s"bad checksum: $addr")
    require(payload(0) == 0, s"not a classic address: $addr")
    payload.drop(1)
  }

  private def hex(s: String): Array[Byte] = {
    require(s.length % 2 == 0, s"odd hex length: $s")
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  /** Variable-length length prefix (spec's three-range encoding). */
  private def vl(len: Int): Array[Byte] =
    if (len <= 192) Array(len.toByte)
    else if (len <= 12480) {
      val l = len - 193
      Array((193 + (l >> 8)).toByte, (l & 0xff).toByte)
    } else {
      val l = len - 12481
      Array((241 + (l >> 16)).toByte, ((l >> 8) & 0xff).toByte,
        (l & 0xff).toByte)
    }

  /** Field ID header bytes for (type code, field code). */
  private def fieldId(t: Int, f: Int): Array[Byte] =
    if (t < 16 && f < 16) Array(((t << 4) | f).toByte)
    else if (t < 16) Array((t << 4).toByte, f.toByte)
    else if (f < 16) Array(f.toByte, t.toByte)
    else Array(0.toByte, t.toByte, f.toByte)

  /** 160-bit currency field: 3-char ISO placed at bytes 12-14, or a
    * 40-hex-char custom code verbatim.
    */
  private def currency(code: String): Array[Byte] = {
    val out = new Array[Byte](20)
    if (code.length == 40) hex(code)
    else {
      require(code.length == 3, s"bad currency: $code")
      if (code != "XRP")
        code.getBytes("US-ASCII").copyToArray(out, 12)
      out
    }
  }

  private def be(v: Long, bytes: Int): Array[Byte] =
    (bytes - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  /** Amount: XRP drops (string/number) or IOU {currency,issuer,value}. */
  private def amount(n: JsonNode): Array[Byte] =
    if (n.isTextual || n.isNumber) {
      val drops = new BigInteger(n.asText())
      require(drops.signum >= 0, s"negative drops: $n")
      be(drops.longValueExact | 0x4000000000000000L, 8)
    } else {
      val value = new java.math.BigDecimal(n.get("value").asText())
      val cur = currency(n.get("currency").asText())
      val issuer = decodeAccountId(n.get("issuer").asText())
      val bits =
        if (value.signum == 0) 0x8000000000000000L
        else {
          var m = value.abs.stripTrailingZeros.unscaledValue
          var e = -value.abs.stripTrailingZeros.scale
          val lo = BigInteger.valueOf(1000000000000000L)
          val hi = BigInteger.valueOf(10000000000000000L)
          while (m.compareTo(lo) < 0) { m = m.multiply(BigInteger.TEN); e -= 1 }
          while (m.compareTo(hi) >= 0) {
            val Array(q, r) = m.divideAndRemainder(BigInteger.TEN)
            require(r.signum == 0, s"more than 16 significant digits: $n")
            m = q; e += 1
          }
          require(e >= -96 && e <= 80, s"IOU exponent out of range: $n")
          0x8000000000000000L |
            (if (value.signum > 0) 1L << 62 else 0L) |
            ((e + 97).toLong << 54) | m.longValueExact
        }
      be(bits, 8) ++ cur ++ issuer
    }

  private def pathSet(n: JsonNode): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val paths = (0 until n.size()).map(n.get)
    paths.zipWithIndex.foreach { case (path, pi) =>
      if (pi > 0) out.write(0xff)
      (0 until path.size()).map(path.get).foreach { step =>
        val acct = Json.opt(step, "account")
        val cur = Json.opt(step, "currency")
        val iss = Json.opt(step, "issuer")
        val flag = (if (acct.isDefined) 0x01 else 0) |
          (if (cur.isDefined) 0x10 else 0) |
          (if (iss.isDefined) 0x20 else 0)
        out.write(flag)
        acct.foreach(a => out.write(decodeAccountId(a.asText())))
        cur.foreach(c => out.write(currency(c.asText())))
        iss.foreach(i => out.write(decodeAccountId(i.asText())))
      }
    }
    out.write(0x00)
    out.toByteArray
  }

  /** Serialize one field's VALUE (header written by the caller). */
  private def value(name: String, t: Int, n: JsonNode): Array[Byte] =
    t match {
      case 1 =>
        val v =
          if (name == "TransactionType" && n.isTextual)
            TxTypes.getOrElse(n.asText(),
              sys.error(s"unknown TransactionType ${n.asText()}"))
          else if (name == "LedgerEntryType" && n.isTextual)
            LedgerEntryTypes.getOrElse(n.asText(),
              sys.error(s"unknown LedgerEntryType ${n.asText()}"))
          else n.asInt()
        be(v.toLong, 2)
      case 2 => be(n.asLong(), 4)
      case 3 => // UInt64 arrives as a 16-hex-char string
        val b = hex(n.asText()); require(b.length == 8); b
      case 16 =>
        val v =
          if (name == "TransactionResult" && n.isTextual)
            ResultCodes.getOrElse(n.asText(),
              sys.error(s"unknown TransactionResult ${n.asText()}"))
          else n.asInt()
        Array(v.toByte)
      case 17 => val b = hex(n.asText()); require(b.length == 20); b
      case 4 => val b = hex(n.asText()); require(b.length == 16); b
      case 5 => val b = hex(n.asText()); require(b.length == 32); b
      case 6 => amount(n)
      case 7 => val b = hex(n.asText()); vl(b.length) ++ b
      case 8 => val b = decodeAccountId(n.asText()); vl(b.length) ++ b
      case 14 => // nested object (wrapper key already consumed)
        serializeFields(n) ++ Array(0xe1.toByte) // ObjectEndMarker
      case 15 => // array of single-key wrapper objects
        val out = new ByteArrayOutputStream()
        (0 until n.size()).map(n.get).foreach { el =>
          val inner = el.properties().iterator().next()
          val (it, ic) = Fields.getOrElse(inner.getKey,
            sys.error(s"unknown array element field ${inner.getKey}"))
          require(it == 14, s"array element ${inner.getKey} is not STObject")
          out.write(fieldId(it, ic))
          out.write(value(inner.getKey, it, inner.getValue))
        }
        out.write(0xf1) // ArrayEndMarker
        out.toByteArray
      case 18 => pathSet(n)
      case other => sys.error(s"unsupported type code $other for $name")
    }

  /** Canonical field-sorted serialization of an object's fields. */
  private def serializeFields(tx: JsonNode): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val fields = tx.properties().iterator()
    val named = scala.collection.mutable.ArrayBuffer
      .empty[(String, JsonNode)]
    while (fields.hasNext) {
      val e = fields.next()
      if (e.getKey != "hash" && e.getKey != "metaData")
        named += ((e.getKey, e.getValue))
    }
    named
      .map { case (k, v) =>
        val (t, c) = Fields.getOrElse(k, sys.error(s"unknown field $k"))
        (t, c, k, v)
      }
      .sortBy { case (t, c, _, _) => (t, c) }
      .foreach { case (t, c, k, v) =>
        out.write(fieldId(t, c))
        out.write(value(k, t, v))
      }
    out.toByteArray
  }

  /** Canonical binary serialization of a transaction JSON object. */
  def encodeTx(tx: JsonNode): Array[Byte] = serializeFields(tx)

  /** Transaction ID: SHA512-half over the TXN-prefixed blob. */
  def txHash(tx: JsonNode): String =
    toHex(sha512Half(0x54584e00, encodeTx(tx)))

  /** Canonical serialization of a transaction's metadata object. */
  def encodeMeta(meta: JsonNode): Array[Byte] = serializeFields(meta)

  private val Zero32 = new Array[Byte](32)

  private def toHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02X").mkString

  private def sha512Half(prefix: Int, data: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-512")
    md.update(Array((prefix >>> 24).toByte, (prefix >>> 16).toByte,
      (prefix >>> 8).toByte, prefix.toByte))
    data.foreach(md.update)
    md.digest().take(32)
  }

  /** SHAMap transaction-leaf hash: SND-prefixed VL(tx blob) ++
    * VL(meta blob) ++ transaction ID.
    */
  def txLeafHash(tx: JsonNode): Array[Byte] = {
    val txBlob = encodeTx(tx)
    val metaBlob = encodeMeta(tx.get("metaData"))
    sha512Half(0x534e4400, vl(txBlob.length), txBlob,
      vl(metaBlob.length), metaBlob, hex(txHash(tx)))
  }

  /** The ledger's `transaction_hash`: root of the 16-way SHAMap over
    * (transaction ID -> tx+meta leaf). Leaves collapse (a 1-item
    * subtree IS its leaf hash); empty subtrees hash as 32 zero bytes;
    * inner nodes are MIN-prefixed over the 16 child hashes.
    */
  def txTreeHash(txs: Seq[JsonNode]): String = {
    val items = txs.map(t => (txHash(t), txLeafHash(t)))
    def node(its: Seq[(String, Array[Byte])], depth: Int): Array[Byte] =
      if (its.isEmpty) Zero32
      // leaf collapse applies BELOW the root only: the root of a
      // non-empty SHAMap is always an inner node (a single-tx ledger's
      // root is one inner node with one leaf child)
      else if (its.size == 1 && depth > 0) its.head._2
      else {
        val kids = (0 until 16).map { nib =>
          node(its.filter(i =>
            Character.digit(i._1.charAt(depth), 16) == nib), depth + 1)
        }
        sha512Half(0x4d494e00, kids: _*)
      }
    toHex(node(items, 0))
  }

  /** Seconds between the unix and ripple epochs (2000-01-01T00:00Z). */
  val RippleEpochOffset = 946684800L

  /** The ledger hash: SHA512-half of the LWR-prefixed packed header
    * (index, drops, parent/tx/account hashes, parent close, close,
    * resolution, flags) — closeFlags defaults to 0 (sLCF_NoConsensusTime
    * unset), matching every fixture header.
    */
  def ledgerHash(index: Long, totalDrops: Long, parentHash: String,
      txHash: String, accountHash: String, parentCloseRipple: Long,
      closeRipple: Long, closeTimeRes: Int, closeFlags: Int = 0): String =
    toHex(sha512Half(0x4c575200,
      be(index, 4), be(totalDrops, 8), hex(parentHash), hex(txHash),
      hex(accountHash), be(parentCloseRipple, 4), be(closeRipple, 4),
      Array(closeTimeRes.toByte), Array(closeFlags.toByte)))
}
