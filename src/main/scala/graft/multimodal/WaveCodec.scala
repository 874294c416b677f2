package graft.multimodal

/** Pure-JVM RIFF/WAVE codec for the multimodal audio path: 16-bit
  * PCM mono, parsed from the public RIFF container layout (the
  * Microsoft/IBM WAVE spec) — a real chunk walker, not a fixed-offset
  * read: it skips unknown chunks (LIST, fact, …) by their declared
  * size, honors RIFF's word alignment (odd-sized chunks are padded),
  * and validates the fmt fields before touching sample data.
  */
object WaveCodec {

  /** Decoded PCM: signed 16-bit little-endian samples. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Serialize mono 16-bit PCM into a RIFF/WAVE file. A junk LIST
    * chunk is emitted between fmt and data — the spec allows
    * arbitrary chunks there, so every round-trip exercises the
    * decoder's chunk-skipping rather than a fixed header offset.
    */
  def encode(pcm: Pcm): Array[Byte] = {
    require(pcm.channels == 1, "encoder emits mono")
    val junk = "INFOgraft".getBytes("US-ASCII")           // LIST payload
    val dataSize = pcm.samples.length * 2
    // RIFF size = everything after the 8-byte RIFF header
    val riffSize = 4 + (8 + 16) + (8 + junk.length + (junk.length & 1)) +
      (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var pos = 0
    def putStr(s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, pos, b.length); pos += b.length
    }
    def le32(v: Int): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
      out(pos + 2) = ((v >> 16) & 0xff).toByte
      out(pos + 3) = ((v >> 24) & 0xff).toByte
      pos += 4
    }
    def le16(v: Int): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
      pos += 2
    }
    putStr("RIFF"); le32(riffSize); putStr("WAVE")
    putStr("fmt "); le32(16)
    le16(1)                           // PCM
    le16(1)                           // mono
    le32(pcm.sampleRate)
    le32(pcm.sampleRate * 2)          // byte rate
    le16(2)                           // block align
    le16(16)                          // bits per sample
    putStr("LIST"); le32(junk.length)
    System.arraycopy(junk, 0, out, pos, junk.length); pos += junk.length
    if ((junk.length & 1) == 1) pos += 1  // word-align pad byte
    putStr("data"); le32(dataSize)
    var i = 0
    while (i < pcm.samples.length) {
      val s = pcm.samples(i)
      out(pos) = (s & 0xff).toByte
      out(pos + 1) = ((s >> 8) & 0xff).toByte
      pos += 2
      i += 1
    }
    out
  }

  /** Parse a RIFF/WAVE file into 16-bit PCM. Left(reason) on bad
    * magic, missing/invalid fmt, non-PCM compression, unsupported bit
    * depth, or a truncated data chunk. Unknown chunks are skipped by
    * declared size with odd-size padding, per the RIFF spec.
    */
  def decode(bytes: Array[Byte]): Either[String, Pcm] = {
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def tag(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    if (bytes.length < 12) return Left("too short for RIFF header")
    if (tag(0) != "RIFF") return Left("bad RIFF magic")
    if (tag(8) != "WAVE") return Left("not a WAVE form")
    var pos = 12
    var fmt: Option[(Int, Int)] = None  // (sampleRate, channels)
    while (pos + 8 <= bytes.length) {
      val ckId = tag(pos)
      val ckSize = le32(pos + 4)
      val body = pos + 8
      if (ckSize < 0 || body + ckSize > bytes.length)
        return Left(s"chunk '$ckId' overruns file")
      ckId match {
        case "fmt " =>
          if (ckSize < 16) return Left("fmt chunk too small")
          if (le16(body) != 1)
            return Left(s"unsupported compression ${le16(body)}")
          if (le16(body + 14) != 16)
            return Left(s"unsupported bit depth ${le16(body + 14)}")
          fmt = Some((le32(body + 4), le16(body + 2)))
        case "data" =>
          fmt match {
            case None => return Left("data chunk before fmt")
            case Some((rate, ch)) =>
              if ((ckSize & 1) == 1) return Left("odd data size for 16-bit")
              val samples = new Array[Short](ckSize / 2)
              var i = 0
              while (i < samples.length) {
                samples(i) = le16(body + 2 * i).toShort
                i += 1
              }
              return Right(Pcm(rate, ch, samples))
          }
        case _ => ()  // LIST/fact/…: skip by declared size
      }
      pos = body + ckSize + (ckSize & 1)  // odd chunks pad to word
    }
    Left("no data chunk")
  }

  /** Exact integer stats over decoded PCM — the audio analogue of
    * [[RasterCodec.stats]]: total |amplitude| (the energy proxy),
    * sign-change count (zero-crossing rate numerator — the classic
    * cheap voicing/noisiness feature), and the position-weighted
    * checksum that pins every sample's VALUE and POSITION, so a
    * byte-order or alignment mistake cannot checksum-match.
    */
  def stats(pcm: Pcm): (Long, Long, Long) = {
    var sumAbs = 0L; var zc = 0L; var ck = 0L
    var i = 0
    while (i < pcm.samples.length) {
      val s = pcm.samples(i).toLong
      sumAbs += math.abs(s)
      if (i > 0 && (s < 0) != (pcm.samples(i - 1) < 0)) zc += 1
      ck += s * (i + 1)
      i += 1
    }
    (sumAbs, zc, ck)
  }
}
