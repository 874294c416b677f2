package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.WaveCodec
import graft.multimodal.WaveCodec.Pcm

/** Value-level proof of the RIFF/WAVE codec: chunk walking (the
  * encoder plants a LIST chunk before data), signed 16-bit LE
  * decoding, word alignment, and loud rejection of malformed input.
  */
class WaveCodecSpec extends AnyFunSuite {

  private val tone: Array[Short] =
    Array.tabulate(200)(i => ((i * 523) % 30000 - 15000).toShort)

  test("round-trip recovers rate and every signed sample") {
    val wav = WaveCodec.encode(Pcm(16000, 1, tone))
    val got = WaveCodec.decode(wav)
    assert(got.isRight)
    val p = got.toOption.get
    assert(p.sampleRate == 16000 && p.channels == 1)
    assert(p.samples.sameElements(tone))
  }

  test("decoder skips unknown chunks by declared size (incl. odd pad)") {
    // splice an ODD-sized junk chunk after fmt: the walker must land
    // on the word-aligned next chunk, not one byte short
    val wav = WaveCodec.encode(Pcm(8000, 1, tone.take(10)))
    val dataAt = {
      var p = 12
      while (new String(wav, p, 4, "US-ASCII") != "LIST") p += 1
      p
    }
    // id "junk", declared size 3 (ODD), payload "abc", 1 pad byte
    val junk = "junk".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ "abc!".getBytes("US-ASCII")
    val spliced = wav.take(dataAt) ++ junk ++ wav.drop(dataAt)
    val got = WaveCodec.decode(spliced)
    assert(got.isRight && got.toOption.get.samples.sameElements(tone.take(10)))
  }

  test("decoder rejects malformed input with a reason") {
    val wav = WaveCodec.encode(Pcm(8000, 1, tone.take(4)))
    assert(WaveCodec.decode("RIFX1234WAVE".getBytes("US-ASCII"))
      .left.exists(_.contains("magic")))
    val notWave = wav.clone(); notWave(8) = 'A'
    assert(WaveCodec.decode(notWave).left.exists(_.contains("WAVE")))
    assert(WaveCodec.decode(wav.dropRight(3))
      .left.exists(_.contains("overruns")))
    // flip compression to 2 (ADPCM): fmt body starts at 20
    val adpcm = wav.clone(); adpcm(20) = 2
    assert(WaveCodec.decode(adpcm).left.exists(_.contains("compression")))
    val deep = wav.clone(); deep(34) = 8
    assert(WaveCodec.decode(deep).left.exists(_.contains("bit depth")))
  }

  test("stats: energy, zero crossings, position-weighted checksum") {
    val p = Pcm(8000, 1, Array[Short](5, -3, -2, 4, 0))
    val (sa, zc, ck) = WaveCodec.stats(p)
    assert(sa == 14)
    // sign flips: 5->-3, -2->4; 4->0 is NOT a flip (0 counts as >= 0)
    assert(zc == 2)
    assert(ck == 5 * 1 + -3 * 2 + -2 * 3 + 4 * 4 + 0 * 5)
  }
}
