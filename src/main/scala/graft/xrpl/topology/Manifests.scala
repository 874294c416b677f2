package graft.xrpl.topology

import java.security.spec.NamedParameterSpec
import java.security.{KeyFactory, Signature}
import java.security.interfaces.EdECPublicKey
import java.security.spec.EdECPublicKeySpec
import java.security.spec.EdECPoint
import java.security.MessageDigest

/** X16: validator-manifest verification
  * (lib/validations/manifests.js:38-72).
  *
  * A manifest binds an ephemeral signing key to a validator's master
  * key. The signed payload is "MAN\0" + '$'+seq(u32BE) + 'q'+len+
  * masterPub + ['s'+len+ephemeralPub]; the signature is Ed25519 under
  * the master key (first byte 0xED stripped — it is the key-type
  * prefix). Node public keys are base58 (ripple alphabet) with a 0x1C
  * type byte and a 4-byte double-SHA256 checksum
  * (ripple-address-codec.decodeNodePublic).
  *
  * Uses the JDK 17 Ed25519 provider — no external crypto dependency.
  */
object Manifests {

  /** Ripple's base58 alphabet (public, ripple-address-codec). */
  private val Alphabet = "rpshnaf39wBUDNEGHJKLM4PQRST7VWXYZ2bcdeCg65jkm8oFqi1tuvAxyz"
  private val AlphabetIndex: Map[Char, Int] =
    Alphabet.zipWithIndex.toMap

  /** Base58 decode (ripple alphabet), no checksum handling. */
  def base58Decode(s: String): Array[Byte] = {
    var num = BigInt(0)
    s.foreach { c =>
      val d = AlphabetIndex.getOrElse(c, sys.error(s"bad base58 char: $c"))
      num = num * 58 + d
    }
    val bytes = num.toByteArray.dropWhile(_ == 0)
    // preserve leading zeros (alphabet char 0 = 'r')
    val leading = s.takeWhile(_ == Alphabet(0)).length
    Array.fill[Byte](leading)(0) ++ bytes
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** decodeNodePublic: base58check with type prefix 0x1C → 33-byte
    * key (0xED prefix for ed25519).
    */
  def decodeNodePublic(s: String): Array[Byte] = {
    val raw = base58Decode(s)
    require(raw.length >= 5, "node public too short")
    val (payload, checksum) = raw.splitAt(raw.length - 4)
    val expected = sha256(sha256(payload)).take(4)
    require(java.util.Arrays.equals(checksum, expected), "bad checksum")
    require(payload.head == 0x1c.toByte, "not a node public key")
    payload.tail // 33 bytes incl. key-type prefix
  }

  /** Build the signed manifest payload (manifests.js:38-66). */
  def manifestPayload(sequence: Long, masterPub: Array[Byte],
      ephemeralPub: Option[Array[Byte]]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write("MAN".getBytes("US-ASCII")); buf.write(0)
    buf.write('$')
    buf.write(((sequence >> 24) & 0xff).toInt)
    buf.write(((sequence >> 16) & 0xff).toInt)
    buf.write(((sequence >> 8) & 0xff).toInt)
    buf.write((sequence & 0xff).toInt)
    buf.write('q')
    buf.write(masterPub.length)
    buf.write(masterPub, 0, masterPub.length)
    ephemeralPub.foreach { e =>
      buf.write('s')
      buf.write(e.length)
      buf.write(e, 0, e.length)
    }
    buf.toByteArray
  }

  /** Raw Ed25519 verify via the JDK provider. `publicKey32` is the
    * 32-byte compressed point (little-endian y with sign bit).
    */
  def ed25519Verify(message: Array[Byte], signature: Array[Byte],
      publicKey32: Array[Byte]): Boolean = {
    require(publicKey32.length == 32, "ed25519 key must be 32 bytes")
    // decode compressed point: high bit of last byte = x parity,
    // remaining 255 bits little-endian = y
    val le = publicKey32.clone()
    val xOdd = (le(31) & 0x80) != 0
    le(31) = (le(31) & 0x7f).toByte
    val y = BigInt(1, le.reverse)
    val point = new EdECPoint(xOdd, y.bigInteger)
    val kf = KeyFactory.getInstance("Ed25519")
    val pub = kf.generatePublic(new EdECPublicKeySpec(NamedParameterSpec.ED25519, point))
    val sig = Signature.getInstance("Ed25519")
    sig.initVerify(pub)
    sig.update(message)
    try sig.verify(signature)
    catch { case _: Exception => false }
  }

  def hexToBytes(hex: String): Array[Byte] =
    hex.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Verify a manifest row (master_key/signing_key base58, signatures
    * hex). Mirrors manifests.js verifySignature: prefers
    * master_signature; returns false for non-ed25519 master keys.
    */
  def verifyManifest(sequence: Long, masterKey: String,
      ephemeralKey: Option[String], signatureHex: String): Boolean = {
    try {
      val masterPub = decodeNodePublic(masterKey)
      val ephPub = ephemeralKey.map(decodeNodePublic)
      val payload = manifestPayload(sequence, masterPub, ephPub)
      if (masterPub.head != 0xed.toByte) return false
      ed25519Verify(payload, hexToBytes(signatureHex), masterPub.tail)
    } catch { case _: Exception => false }
  }
}
