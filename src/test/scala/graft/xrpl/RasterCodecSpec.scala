package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.RasterCodec
import graft.multimodal.RasterCodec.Raster

/** Value-level proof of the raster codecs against handcrafted
  * binaries: the decoders must parse real format features (comments,
  * whitespace variants, BGR order, bottom-up scanlines, row padding)
  * and reject malformed input loudly — the mm_decode / mm_decode_bmp /
  * mm_resize gates then hash-check the same math against the SQL
  * oracle at corpus scale.
  */
class RasterCodecSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int): Raster = {
    val px = Array.tabulate(w * h * 3)(i => ((i * 7 + 3) % 251).toByte)
    Raster(w, h, 255, px)
  }

  test("PPM round-trip recovers dims and every pixel") {
    val r = raster(5, 4)
    val got = RasterCodec.decodePpm(RasterCodec.encodePpm(r))
    assert(got.isRight)
    val g = got.toOption.get
    assert(g.width == 5 && g.height == 4 && g.maxval == 255)
    assert(g.pixels.sameElements(r.pixels))
  }

  test("PPM parser handles comments, CRLF, and multi-space headers") {
    val px = raster(2, 2).pixels
    val header = "P6\r\n# c1\n#c2 with 99 numbers\n  2\t2 # trailing\n255\n"
    val got = RasterCodec.decodePpm(header.getBytes("US-ASCII") ++ px)
    assert(got.isRight)
    assert(got.toOption.get.pixels.sameElements(px))
  }

  test("PPM parser rejects malformed input with a reason") {
    val r = raster(3, 3)
    val ok = RasterCodec.encodePpm(r)
    assert(RasterCodec.decodePpm("P5\n3 3\n255\n".getBytes("US-ASCII"))
      .left.exists(_.contains("magic")))
    assert(RasterCodec.decodePpm(ok.dropRight(1))
      .left.exists(_.contains("truncated")))
    assert(RasterCodec.decodePpm("P6\n3 3\n65535\n".getBytes("US-ASCII"))
      .left.exists(_.contains("maxval")))
    assert(RasterCodec.decodePpm("P6\n3\n".getBytes("US-ASCII")).isLeft)
  }

  test("hostile headers fail cleanly, never with an allocation error") {
    // dims whose product overflows Int: must be Left, not a thrown
    // NegativeArraySizeException from w*h*3
    assert(RasterCodec.decodePpm("P6\n40000 40000\n255\n "
      .getBytes("US-ASCII")).left.exists(_.contains("too large")))
    val bmp = RasterCodec.encodeBmp(raster(3, 3))
    val huge = bmp.clone()
    for (k <- 0 until 4) huge(18 + k) = ((40000 >> (8 * k)) & 0xff).toByte
    for (k <- 0 until 4) huge(22 + k) = ((40000 >> (8 * k)) & 0xff).toByte
    assert(RasterCodec.decodeBmp(huge).left.exists(_.contains("too large")))
  }

  test("BMP round-trip recovers the canonical raster through BGR + flip") {
    // width 5: rowSize = ((15+3)/4)*4 = 16, so padding is exercised
    val r = raster(5, 3)
    val bmp = RasterCodec.encodeBmp(r)
    assert(bmp.length == 54 + 16 * 3)
    val got = RasterCodec.decodeBmp(bmp)
    assert(got.isRight)
    assert(got.toOption.get.pixels.sameElements(r.pixels))
    // stats identical across container formats — the gate invariant
    assert(RasterCodec.stats(got.toOption.get) == RasterCodec.stats(
      RasterCodec.decodePpm(RasterCodec.encodePpm(r)).toOption.get))
  }

  test("BMP decoder handles top-down (negative height) scanline order") {
    val r = raster(4, 2)
    val bmp = RasterCodec.encodeBmp(r)
    // flip to top-down: negate biHeight and swap the two stored rows
    val neg = -2
    for (k <- 0 until 4) bmp(22 + k) = ((neg >> (8 * k)) & 0xff).toByte
    val rowSize = 12
    val tmp = bmp.slice(54, 54 + rowSize)
    System.arraycopy(bmp, 54 + rowSize, bmp, 54, rowSize)
    System.arraycopy(tmp, 0, bmp, 54 + rowSize, rowSize)
    val got = RasterCodec.decodeBmp(bmp)
    assert(got.isRight && got.toOption.get.pixels.sameElements(r.pixels))
  }

  test("BMP decoder rejects wrong depth, compression, truncation") {
    val bmp = RasterCodec.encodeBmp(raster(3, 3))
    val d8 = bmp.clone(); d8(28) = 8
    assert(RasterCodec.decodeBmp(d8).left.exists(_.contains("depth")))
    val rle = bmp.clone(); rle(30) = 1
    assert(RasterCodec.decodeBmp(rle).left.exists(_.contains("compression")))
    assert(RasterCodec.decodeBmp(bmp.dropRight(1))
      .left.exists(_.contains("truncated")))
  }

  test("boxResize is the exact scatter/floor-mean pooling") {
    // small source clamps to identity — a box filter never upscales
    val tiny = raster(4, 2)
    val same = RasterCodec.boxResize(tiny, 8)
    assert(same.width == 4 && same.height == 2)
    assert(same.pixels.sameElements(tiny.pixels))
    // genuine downscale: 12x6 -> mx=12, ow=12*8/12=8, oh=6*8/12=4
    val big = raster(12, 6)
    val small = RasterCodec.boxResize(big, 8)
    assert(small.width == 8 && small.height == 4)
    // bucket (0,0,c0) collects source pixels with x*8/12==0, y*4/6==0:
    // x in {0,1}, y in {0,1} -> floor mean of those four bytes
    val vals = for (y <- 0 to 1; x <- 0 to 1)
      yield big.pixels((y * 12 + x) * 3) & 0xff
    assert((small.pixels(0) & 0xff) == vals.sum / 4)
  }
}
