package graft.multimodal

/** Pure-JVM raster codecs for the multimodal decode path: binary
  * PPM (P6) and 24-bit uncompressed BMP, parsed from the public
  * format specifications (netpbm's ppm(5) man page; the Windows
  * BITMAPFILEHEADER/BITMAPINFOHEADER layout). No image library — the
  * container has none — but nothing stubbed either: the decoders
  * really parse headers, comments, row padding, channel order and
  * scanline direction, and fail loudly on malformed input.
  *
  * The decoded representation is canonical RGB, top-down, row-major
  * (`pixels(i)`: pixel `i/3`'s channel `i%3`, pixel `p` at
  * `(x, y) = (p % width, p / width)`), so stats computed from a
  * decode are identical whichever container format carried the
  * payload — the property the `mm_decode`/`mm_decode_bmp` gates pin
  * against one shared SQL oracle.
  */
object RasterCodec {

  /** Canonical decoded raster: RGB, top-down, row-major. */
  final case class Raster(width: Int, height: Int, maxval: Int,
      pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"raster payload ${pixels.length}B != $width x $height x 3")
  }

  // ---------------------------------------------------------------
  // PPM (P6): "P6" <ws> width <ws> height <ws> maxval <single ws>
  // raster. Whitespace runs may contain '#'-to-end-of-line comments.
  // ---------------------------------------------------------------

  /** Serialize to binary PPM. Emits a comment line after the magic —
    * the spec allows it and round-trip tests then exercise the
    * parser's comment handling on every encoded asset.
    */
  def encodePpm(r: Raster): Array[Byte] = {
    val header = s"P6\n# graft raster\n${r.width} ${r.height}\n${r.maxval}\n"
      .getBytes("US-ASCII")
    header ++ r.pixels
  }

  /** Parse a binary PPM. Left(reason) on malformed input — magic
    * mismatch, missing header fields, maxval out of (0, 255],
    * truncated raster.
    */
  def decodePpm(bytes: Array[Byte]): Either[String, Raster] = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // whitespace run, where '#' starts a comment running to newline
    def skipWs(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def readInt(): Either[String, Int] = {
      skipWs()
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) return Left("header int overflow")
        pos += 1
      }
      if (pos == start) Left(s"expected integer at byte $start")
      else Right(v.toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      return Left("not a P6 PPM (bad magic)")
    pos = 2
    for {
      w <- readInt()
      h <- readInt()
      mv <- readInt()
      _ <- if (w <= 0 || h <= 0) Left(s"bad dims ${w}x$h")
           // cap before any size arithmetic: w*h*3 must not overflow
           // Int, or the raster copy below would throw instead of Left
           else if (w.toLong * h > (1L << 26)) Left(s"raster too large ${w}x$h")
           else if (mv <= 0 || mv > 255) Left(s"unsupported maxval $mv")
           // exactly ONE whitespace byte separates maxval from raster
           else if (pos >= bytes.length || !isWs(bytes(pos)))
             Left("missing raster separator")
           else Right(())
      raster <- {
        pos += 1
        val need = w * h * 3
        if (bytes.length - pos < need)
          Left(s"truncated raster: ${bytes.length - pos}B < ${need}B")
        else Right(java.util.Arrays.copyOfRange(bytes, pos, pos + need))
      }
    } yield Raster(w, h, mv, raster)
  }

  // ---------------------------------------------------------------
  // BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24 bpp,
  // BI_RGB (uncompressed), BGR channel order, rows padded to 4-byte
  // multiples, BOTTOM-UP when biHeight > 0.
  // ---------------------------------------------------------------

  private def bmpRowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Serialize to a 24-bit bottom-up BI_RGB BMP — the layout that
    * forces a decoder to get BGR swap, scanline flip, and row padding
    * all right before its stats can match the PPM path's.
    */
  def encodeBmp(r: Raster): Array[Byte] = {
    val rowSize = bmpRowSize(r.width)
    val imageSize = rowSize * r.height
    val fileSize = 54 + imageSize
    val out = new Array[Byte](fileSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, fileSize)                 // bfSize
    le32(10, 54)                      // bfOffBits
    le32(14, 40)                      // biSize
    le32(18, r.width)                 // biWidth
    le32(22, r.height)                // biHeight (>0: bottom-up)
    out(26) = 1                       // biPlanes = 1
    out(28) = 24                      // biBitCount = 24
    le32(30, 0)                       // biCompression = BI_RGB
    le32(34, imageSize)               // biSizeImage
    var y = 0
    while (y < r.height) {
      // canonical row y lands at stored row (height-1-y): bottom-up
      val dst = 54 + (r.height - 1 - y) * rowSize
      var x = 0
      while (x < r.width) {
        val src = (y * r.width + x) * 3
        out(dst + x * 3) = r.pixels(src + 2)     // B
        out(dst + x * 3 + 1) = r.pixels(src + 1) // G
        out(dst + x * 3 + 2) = r.pixels(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bit BI_RGB BMP into the canonical RGB top-down
    * raster. Handles bottom-up AND top-down (negative biHeight)
    * scanline order, arbitrary bfOffBits, and validates compression,
    * bit depth, and raster bounds.
    */
  def decodeBmp(bytes: Array[Byte]): Either[String, Raster] = {
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (bytes.length < 54) return Left("too short for BMP headers")
    if (bytes(0) != 'B' || bytes(1) != 'M') return Left("bad BMP magic")
    val offBits = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) return Left(s"bad dims ${w}x$hRaw")
    // same overflow cap as the PPM path: allocation sizes stay in Int
    if (w.toLong * h > (1L << 26)) return Left(s"raster too large ${w}x$h")
    if (le16(28) != 24) return Left(s"unsupported bit depth ${le16(28)}")
    if (le32(30) != 0) return Left(s"unsupported compression ${le32(30)}")
    val rowSize = bmpRowSize(w)
    if (offBits < 54 || offBits.toLong + rowSize.toLong * h > bytes.length)
      return Left("truncated raster")
    val pixels = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val storedRow = if (topDown) y else h - 1 - y
      val src = offBits + storedRow * rowSize
      var x = 0
      while (x < w) {
        val dst = (y * w + x) * 3
        pixels(dst) = bytes(src + x * 3 + 2)     // R
        pixels(dst + 1) = bytes(src + x * 3 + 1) // G
        pixels(dst + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Right(Raster(w, h, 255, pixels))
  }

  // ---------------------------------------------------------------
  // Decoded-raster math shared by the gates: exact-integer stats and
  // a box-filter downscale — all reproducible in SQL (the oracles).
  // ---------------------------------------------------------------

  /** Exact integer stats over the canonical raster: per-channel byte
    * sums and the position-weighted checksum sum(byte_i * (i+1)) —
    * sensitive to every byte's VALUE and POSITION, so a BGR swap or a
    * flipped scanline cannot checksum-match.
    */
  def stats(r: Raster): (Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
    var i = 0
    while (i < r.pixels.length) {
      val v = (r.pixels(i) & 0xff).toLong
      (i % 3: @annotation.switch) match {
        case 0 => sr += v
        case 1 => sg += v
        case _ => sb += v
      }
      ck += v * (i + 1)
      i += 1
    }
    (sr, sg, sb, ck)
  }

  /** Box-filter downscale to fit a `target`x`target` box, preserving
    * aspect ratio, ALL-INTEGER: out dims are (dim*target)/max(w,h)
    * floor-div, clamped to [1, src dim] — a box FILTER never
    * upscales (an unclamped out dim > src dim would leave output
    * buckets no source pixel scatters into). Each source pixel
    * scatters into output bucket (x*outW/w, y*outH/h) and each output
    * channel value is the floor mean of its bucket; with outW ≤ w the
    * floor map is surjective, so the buckets partition the source
    * exactly and every bucket is non-empty. The SQL oracle reproduces
    * every output byte.
    */
  def boxResize(r: Raster, target: Int): Raster = {
    val mx = math.max(r.width, r.height)
    val ow = math.min(r.width, math.max(1, r.width * target / mx))
    val oh = math.min(r.height, math.max(1, r.height * target / mx))
    val sums = new Array[Long](ow * oh * 3)
    val counts = new Array[Long](ow * oh * 3)
    var y = 0
    while (y < r.height) {
      val oy = y * oh / r.height
      var x = 0
      while (x < r.width) {
        val ox = x * ow / r.width
        val src = (y * r.width + x) * 3
        val dst = (oy * ow + ox) * 3
        var c = 0
        while (c < 3) {
          sums(dst + c) += (r.pixels(src + c) & 0xff).toLong
          counts(dst + c) += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](ow * oh * 3)
    var i = 0
    while (i < out.length) {
      out(i) = (sums(i) / counts(i)).toByte
      i += 1
    }
    Raster(ow, oh, r.maxval, out)
  }
}
