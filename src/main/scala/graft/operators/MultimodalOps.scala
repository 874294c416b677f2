package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * distributed batches.
  *
  * The raster path is REAL: assets are genuine binary PPM (P6) and
  * 24-bit BMP files (built from `documents` bytes — the corpus stands
  * in for a media lake), and [[graft.multimodal.RasterCodec]] parses
  * them from the public format specs — headers, comments, BGR order,
  * bottom-up scanlines, row padding — inside per-partition batched
  * mapPartitions (the Scala analogue of the mapInPandas batch shape).
  * Stats and the box-filter resize are exact-integer, so every gate
  * is value-checked against a SQL oracle that recomputes the expected
  * pixels. Only the video/audio payload interpretations (frame
  * geometry, sample framing) remain synthetic plans over byte ranges.
  *
  * Scale: decode is embarrassingly parallel per partition; outputs are
  * fixed-width scalars so downstream joins partition uniformly. A
  * deployment pointing this at JPEG swaps the codec, not the plan.
  */
object MultimodalOps {

  /** Typed output row of the frame-sample stage: one row per sampled
    * frame (video → frames is a flatMap, 1→N).
    */
  final case class SampledFrame(
      doc_id: Long,
      frame_index: Int,
      n_frames: Int,
      offset_bytes: Long,
      frame_checksum: Long)

  /** Typed output row of the perceptual-hash stage: a 64-bit
    * blockhash held as four 16-bit bands (b0..b3) — the bands are the
    * Hamming-LSH bucketing keys, and 4×16 avoids ever assembling a
    * sign-bit-risky full 64-bit value.
    */
  final case class MediaPhash(doc_id: Long, b0: Long, b1: Long, b2: Long,
      b3: Long)

  /** Deterministic payload interpretations over raw bytes — the
    * video/audio planning shapes (the raster DECODE path is the real
    * [[graft.multimodal.RasterCodec]], not this object).
    */
  object StubDecoder {

    /** Perceptual hash (blockhash family): the payload is split
      * into 64 contiguous blocks; bit k is set iff block k's mean byte
      * exceeds the payload's mean byte. The comparison is the integer
      * cross-multiply `block_sum·n > total_sum·block_len` — exact, so
      * the SQL oracle reproduces identical bits. A real pHash swaps a
      * DCT in here; the banding/bucketing plumbing is what's under
      * test.
      */
    def phash(docId: Long, bytes: Array[Byte]): MediaPhash = {
      val n = bytes.length
      if (n == 0) return MediaPhash(docId, 0L, 0L, 0L, 0L)
      val blockSum = new Array[Long](64)
      val blockLen = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < n) {
        val k = (i.toLong * 64 / n).toInt
        val b = bytes(i) & 0xff
        blockSum(k) += b
        blockLen(k) += 1
        total += b
        i += 1
      }
      val bands = new Array[Long](4)
      var k = 0
      while (k < 64) {
        if (blockSum(k) * n > total * blockLen(k))
          bands(k / 16) |= (1L << (k % 16))
        k += 1
      }
      MediaPhash(docId, bands(0), bands(1), bands(2), bands(3))
    }

    /** STUB frame sampling: treat the payload as `n_frames` fixed-width
      * frames and emit every other frame (1→N flatMap — the video
      * keyframe-sampling batch shape).
      */
    val FrameBytes = 64
    def sampleFrames(docId: Long, bytes: Array[Byte]): Seq[SampledFrame] = {
      val nFrames = math.max(1, bytes.length / FrameBytes)
      (0 until nFrames by 2).map { f =>
        val off = f.toLong * FrameBytes
        val end = math.min(bytes.length, (f + 1) * FrameBytes).toLong
        var sum = 0L
        var i = off.toInt
        while (i < end) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
        SampledFrame(docId, f, nFrames, off, sum)
      }
    }
  }

  /** Raster geometry derived from payload length: width 4..15, height
    * 4..13 — real images in miniature, small enough that the oracle's
    * per-byte SQL expansion stays bounded (≤ 585 raster bytes/asset).
    */
  private def rasterDims(n: Int): (Int, Int) = (4 + n % 12, 4 + n % 10)

  /** (doc_id, ppm): a genuine binary P6 PPM per document — header
    * (magic, comment line, dims, maxval) + the document's bytes
    * right-padded/truncated to exactly width*height*3 raster bytes.
    * Pure Catalyst string/binary algebra (concat + rpad + cast), so
    * asset ASSEMBLY is codegen'd and only the parse is imperative.
    */
  private def ppmAssets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      // byte count (octet_length), NOT character count: the raster
      // oracles size dims from octet_length(encode(text)), and the
      // two only agree on pure-ASCII corpora. Dims must derive from
      // the same byte measure in both engines or a future non-ASCII
      // document silently diverges.
      .select(col("doc_id"), col("text"), octet_length(col("text")).as("n"))
      .withColumn("w", (lit(4) + col("n") % 12).cast("int"))
      .withColumn("h", (lit(4) + col("n") % 10).cast("int"))
      .select(col("doc_id"),
        concat(
          concat_ws("", lit("P6\n# graft raster\n"),
            col("w").cast("string"), lit(" "),
            col("h").cast("string"), lit("\n255\n")),
          expr("rpad(text, w * h * 3, ' ')")).cast("binary").as("ppm"))

  /** The byte-level CTEs both raster oracles build on: per-asset dims
    * + the hex dump of the padded raster (`m`), then one row per
    * raster byte with its decoded value (`b`) — DuckDB recomputing
    * what the JVM decoder reads from the container format.
    */
  private val rasterByteCtes: String =
    """m AS (
      |  SELECT doc_id,
      |    CAST(4 + octet_length(encode(text)) % 12 AS INT) AS w,
      |    CAST(4 + octet_length(encode(text)) % 10 AS INT) AS h,
      |    hex(encode(rpad(text,
      |      CAST((4 + octet_length(encode(text)) % 12) *
      |           (4 + octet_length(encode(text)) % 10) * 3 AS INT),
      |      ' '))) AS hx
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, w, h, i,
      |    strpos('123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1))*16 +
      |    strpos('123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1)) AS byte
      |  FROM m, LATERAL (SELECT unnest(range(0,
      |    CAST(w * h * 3 AS BIGINT))) AS i) t)""".stripMargin

  /** The decode-stats oracle shared VERBATIM by `mm_decode` (PPM
    * path) and `mm_decode_bmp` (BMP path): both decoders must recover
    * the identical canonical raster, whatever the container format.
    */
  private val decodeOracle: String =
    s"""WITH $rasterByteCtes
       |SELECT doc_id, w AS width, h AS height, CAST(3 AS INT) AS channels,
       |  CAST(w * h AS BIGINT) AS n_pixels,
       |  CAST(SUM(CASE WHEN i % 3 = 0 THEN byte ELSE 0 END) AS BIGINT)
       |    AS sum_r,
       |  CAST(SUM(CASE WHEN i % 3 = 1 THEN byte ELSE 0 END) AS BIGINT)
       |    AS sum_g,
       |  CAST(SUM(CASE WHEN i % 3 = 2 THEN byte ELSE 0 END) AS BIGINT)
       |    AS sum_b,
       |  CAST(SUM(byte * (i + 1)) AS BIGINT) AS checksum
       |FROM b GROUP BY doc_id, w, h
       |ORDER BY doc_id""".stripMargin

  /** Decode stats row: the (doc_id, dims, channel sums, position-
    * weighted checksum) tuple both decode gates emit.
    */
  private def decodeStatsRow(id: Long,
      r: graft.multimodal.RasterCodec.Raster)
      : (Long, Int, Int, Int, Long, Long, Long, Long, Long) = {
    val (sr, sg, sb, ck) = graft.multimodal.RasterCodec.stats(r)
    (id, r.width, r.height, 3, r.width.toLong * r.height, sr, sg, sb, ck)
  }

  private val decodeStatsCols = Seq("doc_id", "width", "height",
    "channels", "n_pixels", "sum_r", "sum_g", "sum_b", "checksum")

  def specs: Seq[QuerySpec] = Seq(
    // Exact-payload dedup on the sampled FIRST FRAME: assets sharing
    // identical leading bytes (same splash frame / template header)
    // collapse to one keeper. Content-hash groupBy — the shuffle key
    // is the digest, so identical payloads co-locate no matter where
    // they sit; survivorship = min asset id, same rule as the
    // document dedup family. At 100 TB this is the first, cheapest
    // dedup pass (hash 40 bytes per asset, not the payload).
    QuerySpec.sql(
      "mm_frame_dedup",
      """SELECT md5(substr(text, 1, 40)) AS frame_md5,
        |  CAST(COUNT(*) AS BIGINT) AS n_assets,
        |  CAST(MIN(doc_id) AS BIGINT) AS keeper_id
        |FROM documents
        |GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY frame_md5""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(md5(substring(col("text"), 1, 40).cast("binary"))
          .as("frame_md5"))
        .agg(count(lit(1)).as("n_assets"),
          min(col("doc_id")).as("keeper_id"))
        .filter(col("n_assets") > 1)
        .orderBy(col("frame_md5"))
    },

    // Metadata path (SQL-expressible): byte length + content digest of
    // the binary payload, grouped per source container.
    QuerySpec.sql(
      "mm_binary_meta",
      """SELECT source, COUNT(*) AS n_assets,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  MIN(octet_length(encode(text))) AS min_bytes,
        |  MAX(octet_length(encode(text))) AS max_bytes,
        |  COUNT(DISTINCT md5(text)) AS n_distinct
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_assets"),
          sum(octet_length(col("text"))).cast("long").as("total_bytes"),
          min(octet_length(col("text"))).as("min_bytes"),
          max(octet_length(col("text"))).as("max_bytes"),
          countDistinct(md5(col("text"))).as("n_distinct"))
        .orderBy(col("source"))
    },

    // Tile-grid planning (vision preprocessing, fully SQL-checkable):
    // each asset's (width, height) metadata expands to its 16x16 tile
    // grid with edge tiles clipped — the 1→N flatMap a patch-based
    // vision pipeline (ViT patches, SAM tiles) runs before any pixel
    // is touched. Pure integer arithmetic over metadata, so unlike
    // the decode stubs this op is END-TO-END oracle-checked; ~20 rows
    // per asset, embarrassingly parallel, no shuffle before the
    // output sort.
    QuerySpec.sql(
      "mm_tile_plan",
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
        |    CAST(16 + octet_length(encode(text)) % 48 AS INT) AS height
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, width, height,
        |    CAST(tx AS INT) AS tx, CAST(ty AS INT) AS ty
        |  FROM m,
        |    UNNEST(generate_series(0,
        |      CAST(ceil(width / 16.0) AS INT) - 1)) t1(tx),
        |    UNNEST(generate_series(0,
        |      CAST(ceil(height / 16.0) AS INT) - 1)) t2(ty))
        |SELECT doc_id, tx, ty,
        |  tx * 16 AS x0, ty * 16 AS y0,
        |  LEAST(16, width - tx * 16) AS tw,
        |  LEAST(16, height - ty * 16) AS th
        |FROM g ORDER BY doc_id, ty, tx""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), octet_length(col("text")).as("n"))
        .withColumn("width", (lit(16) + col("n") % 64).cast("int"))
        .withColumn("height", (lit(16) + col("n") % 48).cast("int"))
        .withColumn("tx", explode(sequence(lit(0),
          ceil(col("width") / 16.0).cast("int") - 1)))
        .withColumn("ty", explode(sequence(lit(0),
          ceil(col("height") / 16.0).cast("int") - 1)))
        .select(col("doc_id"), col("tx"), col("ty"),
          (col("tx") * 16).as("x0"), (col("ty") * 16).as("y0"),
          least(lit(16), col("width") - col("tx") * 16).as("tw"),
          least(lit(16), col("height") - col("ty") * 16).as("th"))
        .orderBy(col("doc_id"), col("ty"), col("tx"))
    },

    // Overlapping-frame planning (audio preprocessing): STFT-style
    // framing over a payload's sample count (16-bit mono ⇒ bytes/2
    // samples), window 100 / hop 40 — the 1→N expansion a speech
    // pipeline runs before any DSP. Unlike the tile grid this is
    // OVERLAPPED framing, and assets shorter than one window plan
    // ZERO frames (the inner-join UNNEST drops them — the edge the
    // gate pins; an asset row must not survive frameless).
    QuerySpec.sql(
      "mm_audio_frame_plan",
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) // 2 AS INT) AS n_samples
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_samples, CAST(fi AS INT) AS frame_index
        |  FROM m,
        |    UNNEST(generate_series(0,
        |      CAST(floor((n_samples - 100) / 40.0) AS INT))) t(fi)
        |  WHERE n_samples >= 100)
        |SELECT doc_id, frame_index,
        |  frame_index * 40 AS start_sample,
        |  frame_index * 40 + 100 AS end_sample,
        |  n_samples
        |FROM f ORDER BY doc_id, frame_index""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          floor(octet_length(col("text")) / 2).cast("int").as("n_samples"))
        .filter(col("n_samples") >= 100)
        .withColumn("frame_index", explode(sequence(lit(0),
          floor((col("n_samples") - 100) / 40.0).cast("int"))))
        .select(col("doc_id"), col("frame_index"),
          (col("frame_index") * 40).as("start_sample"),
          (col("frame_index") * 40 + 100).as("end_sample"),
          col("n_samples"))
        .orderBy(col("doc_id"), col("frame_index"))
    },

    // REAL DECODE, audio path: each document becomes a genuine
    // RIFF/WAVE file (16-bit PCM mono; a junk LIST chunk sits between
    // fmt and data so the parse exercises RIFF chunk-walking, not a
    // fixed offset) and WaveCodec.decode parses it back in
    // per-partition batches. Sample bytes are the document's padded
    // bytes XOR 0xA5 — the XOR pushes high bytes past 0x80 so SIGNED
    // 16-bit decoding is actually exercised (ASCII alone never goes
    // negative). Stats are exact integers: total |amplitude|,
    // zero-crossing count, position-weighted signed checksum; the
    // oracle recomputes every sample from the bytes in SQL.
    QuerySpec.sql(
      "mm_audio_decode",
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(50 + octet_length(encode(text)) % 100 AS INT) AS ns,
        |    CAST(8000 + (octet_length(encode(text)) % 4) * 4000 AS INT)
        |      AS rate,
        |    hex(encode(rpad(text,
        |      CAST((50 + octet_length(encode(text)) % 100) * 2 AS INT),
        |      ' '))) AS hx
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, ns, rate, i,
        |    xor(strpos('123456789ABCDEF', substr(hx, CAST(4*i+1 AS INT), 1))*16
        |      + strpos('123456789ABCDEF', substr(hx, CAST(4*i+2 AS INT), 1)),
        |      165) AS lo,
        |    xor(strpos('123456789ABCDEF', substr(hx, CAST(4*i+3 AS INT), 1))*16
        |      + strpos('123456789ABCDEF', substr(hx, CAST(4*i+4 AS INT), 1)),
        |      165) AS hi
        |  FROM m, LATERAL (SELECT unnest(range(0,
        |    CAST(ns AS BIGINT))) AS i) t),
        |s AS (
        |  SELECT doc_id, ns, rate, i,
        |    CASE WHEN lo + 256 * hi >= 32768 THEN lo + 256 * hi - 65536
        |         ELSE lo + 256 * hi END AS v
        |  FROM b),
        |l AS (
        |  SELECT doc_id, ns, rate, i, v,
        |    LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id, ns AS n_samples, rate AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(COALESCE(SUM(CASE WHEN pv IS NOT NULL
        |    AND (v < 0) <> (pv < 0) THEN 1 END), 0) AS BIGINT)
        |    AS zero_cross,
        |  CAST(SUM(v * (i + 1)) AS BIGINT) AS checksum
        |FROM l GROUP BY doc_id, ns, rate
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.WaveCodec
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val n = raw.length
          val ns = 50 + n % 100
          val rate = 8000 + (n % 4) * 4000
          val samples = new Array[Short](ns)
          var i = 0
          while (i < ns) {
            def b(j: Int): Int =
              ((if (j < n) raw(j) else ' '.toByte) ^ 0xA5) & 0xff
            samples(i) = (b(2 * i) | (b(2 * i + 1) << 8)).toShort
            i += 1
          }
          val wav = WaveCodec.encode(WaveCodec.Pcm(rate, 1, samples))
          val pcm = WaveCodec.decode(wav)
            .fold(e => throw new IllegalArgumentException(
              s"doc $id: $e"), identity)
          val (sa, zc, ck) = WaveCodec.stats(pcm)
          (id, pcm.samples.length, pcm.sampleRate, pcm.channels,
            sa, zc, ck)
        })
        .toDF("doc_id", "n_samples", "sample_rate", "channels",
          "sum_abs", "zero_cross", "checksum")
        .orderBy(col("doc_id"))
    },

    // REAL DSP, downsample path: decode the same RIFF/WAVE assets and
    // 2:1-decimate with midpoint averaging — out[k] = ⌊(s[2k] +
    // s[2k+1]) / 2⌋ (FLOOR division, Math.floorDiv on the JVM ≡ `//`
    // in the oracle — truncate-toward-zero would disagree on negative
    // sums, the edge the XOR-signed samples exercise); an odd trailing
    // sample drops. Stats over the HALVED signal are the decode gate's
    // exact integers, so the oracle — which recomputes every output
    // sample from the document bytes — pins the resample arithmetic,
    // not just the plumbing. Per-asset work in mapPartitions batches,
    // no shuffle before the output sort.
    QuerySpec.sql(
      "mm_audio_downsample",
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(50 + octet_length(encode(text)) % 100 AS INT) AS ns,
        |    CAST(8000 + (octet_length(encode(text)) % 4) * 4000 AS INT)
        |      AS rate,
        |    hex(encode(rpad(text,
        |      CAST((50 + octet_length(encode(text)) % 100) * 2 AS INT),
        |      ' '))) AS hx
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, ns, rate, i,
        |    xor(strpos('123456789ABCDEF', substr(hx, CAST(4*i+1 AS INT), 1))*16
        |      + strpos('123456789ABCDEF', substr(hx, CAST(4*i+2 AS INT), 1)),
        |      165) AS lo,
        |    xor(strpos('123456789ABCDEF', substr(hx, CAST(4*i+3 AS INT), 1))*16
        |      + strpos('123456789ABCDEF', substr(hx, CAST(4*i+4 AS INT), 1)),
        |      165) AS hi
        |  FROM m, LATERAL (SELECT unnest(range(0,
        |    CAST(ns AS BIGINT))) AS i) t),
        |s AS (
        |  SELECT doc_id, ns, rate, i,
        |    CASE WHEN lo + 256 * hi >= 32768 THEN lo + 256 * hi - 65536
        |         ELSE lo + 256 * hi END AS v
        |  FROM b),
        |p AS (
        |  -- FLOOR division (DuckDB // truncates toward zero; the JVM
        |  -- side floorDivs) — exact via double, |pair sum| < 2^17
        |  SELECT doc_id, ns, rate, CAST(i // 2 AS BIGINT) AS k,
        |    CAST(floor(CAST(SUM(v) AS DOUBLE) / 2) AS BIGINT) AS v2
        |  FROM s WHERE i < ns - (ns % 2)
        |  GROUP BY doc_id, ns, rate, CAST(i // 2 AS BIGINT)),
        |l AS (
        |  SELECT doc_id, ns, rate, k, v2,
        |    LAG(v2) OVER (PARTITION BY doc_id ORDER BY k) AS pv
        |  FROM p)
        |SELECT doc_id, CAST(ns // 2 AS INT) AS n_out,
        |  CAST(rate // 2 AS INT) AS out_rate,
        |  CAST(SUM(ABS(v2)) AS BIGINT) AS sum_abs,
        |  CAST(COALESCE(SUM(CASE WHEN pv IS NOT NULL
        |    AND (v2 < 0) <> (pv < 0) THEN 1 END), 0) AS BIGINT)
        |    AS zero_cross,
        |  CAST(SUM(v2 * (k + 1)) AS BIGINT) AS checksum
        |FROM l GROUP BY doc_id, ns, rate
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.WaveCodec
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val n = raw.length
          val ns = 50 + n % 100
          val rate = 8000 + (n % 4) * 4000
          val samples = new Array[Short](ns)
          var i = 0
          while (i < ns) {
            def b(j: Int): Int =
              ((if (j < n) raw(j) else ' '.toByte) ^ 0xA5) & 0xff
            samples(i) = (b(2 * i) | (b(2 * i + 1) << 8)).toShort
            i += 1
          }
          val wav = WaveCodec.encode(WaveCodec.Pcm(rate, 1, samples))
          val pcm = WaveCodec.decode(wav)
            .fold(e => throw new IllegalArgumentException(
              s"doc $id: $e"), identity)
          val m = pcm.samples.length / 2
          val out = new Array[Short](m)
          var k = 0
          while (k < m) {
            out(k) = Math.floorDiv(
              pcm.samples(2 * k) + pcm.samples(2 * k + 1), 2).toShort
            k += 1
          }
          val half = WaveCodec.Pcm(pcm.sampleRate / 2, 1, out)
          val (sa, zc, ck) = WaveCodec.stats(half)
          (id, m, half.sampleRate, sa, zc, ck)
        })
        .toDF("doc_id", "n_out", "out_rate",
          "sum_abs", "zero_cross", "checksum")
        .orderBy(col("doc_id"))
    },

    // REAL DSP, silence-trim path: decode the same RIFF/WAVE assets
    // and find the leading/trailing run of quiet samples (|v| <
    // 16384 — under the 0xA5 XOR every LETTER byte lands quiet and
    // space/digit/punctuation land loud, so letter-initial documents
    // really do trim, and a truncated all-letter tail trims from the
    // right) — the VAD-ish prepass a
    // speech pipeline runs before framing. Emits the first/last loud
    // sample index, the loud count, and the resulting trimmed length;
    // an all-quiet asset trims to zero with NULL edges (the edge the
    // gate pins). The oracle recomputes every signed sample from the
    // document bytes in SQL, so a one-sample-off trim point fails
    // the hash. Per-asset work in mapPartitions batches.
    QuerySpec.sql(
      "mm_audio_silence_trim",
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(50 + octet_length(encode(text)) % 100 AS INT) AS ns,
        |    hex(encode(rpad(text,
        |      CAST((50 + octet_length(encode(text)) % 100) * 2 AS INT),
        |      ' '))) AS hx
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, ns, i,
        |    xor(strpos('123456789ABCDEF', substr(hx, CAST(4*i+1 AS INT), 1))*16
        |      + strpos('123456789ABCDEF', substr(hx, CAST(4*i+2 AS INT), 1)),
        |      165) AS lo,
        |    xor(strpos('123456789ABCDEF', substr(hx, CAST(4*i+3 AS INT), 1))*16
        |      + strpos('123456789ABCDEF', substr(hx, CAST(4*i+4 AS INT), 1)),
        |      165) AS hi
        |  FROM m, LATERAL (SELECT unnest(range(0,
        |    CAST(ns AS BIGINT))) AS i) t),
        |s AS (
        |  SELECT doc_id, ns, i,
        |    CASE WHEN lo + 256 * hi >= 32768 THEN lo + 256 * hi - 65536
        |         ELSE lo + 256 * hi END AS v
        |  FROM b)
        |SELECT doc_id, ns AS n_samples,
        |  CAST(MIN(CASE WHEN ABS(v) >= 16384 THEN i END) AS BIGINT)
        |    AS first_loud,
        |  CAST(MAX(CASE WHEN ABS(v) >= 16384 THEN i END) AS BIGINT)
        |    AS last_loud,
        |  CAST(COALESCE(SUM(CASE WHEN ABS(v) >= 16384 THEN 1 END), 0)
        |    AS BIGINT) AS n_loud,
        |  CAST(COALESCE(MAX(CASE WHEN ABS(v) >= 16384 THEN i END)
        |    - MIN(CASE WHEN ABS(v) >= 16384 THEN i END) + 1, 0)
        |    AS BIGINT) AS trimmed_len
        |FROM s GROUP BY doc_id, ns
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.WaveCodec
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val n = raw.length
          val ns = 50 + n % 100
          val rate = 8000 + (n % 4) * 4000
          val samples = new Array[Short](ns)
          var i = 0
          while (i < ns) {
            def b(j: Int): Int =
              ((if (j < n) raw(j) else ' '.toByte) ^ 0xA5) & 0xff
            samples(i) = (b(2 * i) | (b(2 * i + 1) << 8)).toShort
            i += 1
          }
          val wav = WaveCodec.encode(WaveCodec.Pcm(rate, 1, samples))
          val pcm = WaveCodec.decode(wav)
            .fold(e => throw new IllegalArgumentException(
              s"doc $id: $e"), identity)
          var first = -1L; var last = -1L; var loud = 0L
          var j = 0
          while (j < pcm.samples.length) {
            if (Math.abs(pcm.samples(j).toInt) >= 16384) {
              if (first < 0) first = j
              last = j; loud += 1
            }
            j += 1
          }
          (id, pcm.samples.length,
            if (first >= 0) Some(first) else Option.empty[Long],
            if (last >= 0) Some(last) else Option.empty[Long],
            loud, if (first >= 0) last - first + 1 else 0L)
        })
        .toDF("doc_id", "n_samples", "first_loud", "last_loud",
          "n_loud", "trimmed_len")
        .orderBy(col("doc_id"))
    },

    // REAL DECODE, PPM path: each document becomes a genuine binary
    // P6 PPM (Catalyst-assembled — header with a comment line, padded
    // raster), and RasterCodec.decodePpm parses it back in
    // per-partition batches: magic, comment skipping, header ints,
    // raster bounds. The emitted stats are exact integers over the
    // decoded pixels (per-channel sums + position-weighted checksum),
    // so the oracle — which recomputes the expected raster bytes in
    // SQL — catches any mis-parse down to a single byte or position.
    QuerySpec.sql("mm_decode", decodeOracle) { (s, dir) =>
      import s.implicits._
      ppmAssets(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          // batched decode: streaming through the partition's rows
          // (the mapInPandas batch shape); malformed input is loud
          val r = graft.multimodal.RasterCodec.decodePpm(bytes)
            .fold(e => throw new IllegalArgumentException(
              s"doc $id: $e"), identity)
          decodeStatsRow(id, r)
        })
        .toDF(decodeStatsCols: _*)
        .orderBy(col("doc_id"))
    },

    // REAL DECODE, BMP path: the SAME pixels serialized as a 24-bit
    // bottom-up BI_RGB BMP (BGR channel order, 4-byte row padding)
    // and decoded back by RasterCodec.decodeBmp. The oracle is the
    // PPM gate's VERBATIM — the decoder only matches it if the BGR
    // swap, scanline flip, and padding skip are all exactly right,
    // which is the point: container format must be invisible in the
    // canonical raster.
    QuerySpec.sql("mm_decode_bmp", decodeOracle) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.RasterCodec
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val (w, h) = rasterDims(raw.length)
          val pix = java.util.Arrays.copyOf(raw, w * h * 3)
          // pad with ' ' (rpad semantics), not copyOf's zeros
          java.util.Arrays.fill(pix, math.min(raw.length, pix.length),
            pix.length, ' '.toByte)
          val bmp = RasterCodec.encodeBmp(RasterCodec.Raster(w, h, 255, pix))
          val r = RasterCodec.decodeBmp(bmp)
            .fold(e => throw new IllegalArgumentException(
              s"doc $id: $e"), identity)
          decodeStatsRow(id, r)
        })
        .toDF(decodeStatsCols: _*)
        .orderBy(col("doc_id"))
    },

    // REAL RESIZE: decode the PPM, then an actual box-filter
    // downscale to fit an 8x8 box — each source pixel scatters into
    // its output bucket, each output channel value is the floor mean
    // of its bucket — all-integer, so the oracle reproduces every
    // output BYTE (the out_checksum is position-weighted over the
    // resized raster, not a proxy). This is the real pooling math a
    // thumbnail/patch pipeline runs, in the mapPartitions batch shape.
    QuerySpec.sql(
      "mm_resize",
      s"""WITH $rasterByteCtes,
         |d AS (
         |  SELECT doc_id,
         |    LEAST(w, GREATEST(1,
         |      CAST((w * 8) // GREATEST(w, h) AS INT))) AS ow,
         |    LEAST(h, GREATEST(1,
         |      CAST((h * 8) // GREATEST(w, h) AS INT))) AS oh
         |  FROM m),
         |px AS (
         |  SELECT b.doc_id, w, h, ow, oh,
         |    (((i // 3) % w) * ow) // w AS ox,
         |    (((i // 3) // w) * oh) // h AS oy,
         |    i % 3 AS c, byte
         |  FROM b JOIN d USING (doc_id)),
         |pool AS (
         |  SELECT doc_id, w, h, ow, oh, ox, oy, c,
         |    SUM(byte) // COUNT(*) AS v
         |  FROM px GROUP BY doc_id, w, h, ow, oh, ox, oy, c)
         |SELECT doc_id, w AS src_width, h AS src_height,
         |  CAST(ow AS INT) AS out_width, CAST(oh AS INT) AS out_height,
         |  CAST(ow * oh AS BIGINT) AS n_out_pixels,
         |  CAST(SUM(v * ((oy * ow + ox) * 3 + c + 1)) AS BIGINT)
         |    AS out_checksum
         |FROM pool GROUP BY doc_id, w, h, ow, oh
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.RasterCodec
      ppmAssets(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val r = RasterCodec.decodePpm(bytes)
            .fold(e => throw new IllegalArgumentException(
              s"doc $id: $e"), identity)
          val out = RasterCodec.boxResize(r, 8)
          val (_, _, _, ck) = RasterCodec.stats(out)
          (id, r.width, r.height, out.width, out.height,
            out.width.toLong * out.height, ck)
        })
        .toDF("doc_id", "src_width", "src_height", "out_width",
          "out_height", "n_out_pixels", "out_checksum")
        .orderBy(col("doc_id"))
    },

    // REAL HISTOGRAM: decode the PPM, then an 8-bin Rec.709 luminance
    // histogram per image — the brightness/exposure profile an image
    // QA pass computes before filtering (all-dark and blown-out assets
    // show up as mass in bins 0 / 7). Luma is the exact integer
    // (2126·R + 7152·G + 722·B) div 10000 ∈ [0,255], bin = luma div 32
    // — both floors, so the oracle recomputing every pixel from the
    // raster hex dump must land each pixel in the identical bin. The
    // decode is per-asset mapPartitions (the batch shape); the
    // histogram reduce never leaves the row.
    QuerySpec.sql(
      "mm_image_histogram",
      s"""WITH $rasterByteCtes,
         |px AS (
         |  SELECT doc_id, i // 3 AS p,
         |    CAST(SUM(CASE i % 3 WHEN 0 THEN 2126 * byte
         |      WHEN 1 THEN 7152 * byte
         |      ELSE 722 * byte END) // 10000 AS BIGINT) AS luma
         |  FROM b GROUP BY 1, 2)
         |SELECT doc_id, CAST(luma // 32 AS INT) AS bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_px
         |FROM px GROUP BY 1, 2
         |ORDER BY doc_id, bin""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.RasterCodec
      ppmAssets(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, bytes) =>
          val r = RasterCodec.decodePpm(bytes)
            .fold(e => throw new IllegalArgumentException(
              s"doc $id: $e"), identity)
          val hist = new Array[Long](8)
          var p = 0
          val n = r.width * r.height
          while (p < n) {
            val lum = (2126 * (r.pixels(3 * p) & 0xff) +
              7152 * (r.pixels(3 * p + 1) & 0xff) +
              722 * (r.pixels(3 * p + 2) & 0xff)) / 10000
            hist(lum / 32) += 1L
            p += 1
          }
          (0 until 8).iterator.filter(hist(_) > 0L)
            .map(bin => (id, bin, hist(bin)))
        })
        .toDF("doc_id", "bin", "n_px")
        .orderBy(col("doc_id"), col("bin"))
    },

    // Frame-sample stage: binary → 1→N flatMap of sampled frames (the
    // video keyframe batch shape); frame count/offsets SQL-expressible,
    // so oracle-checked.
    QuerySpec.sql(
      "mm_frame_sample",
      """SELECT doc_id, CAST(frame_index AS INT) AS frame_index,
        |  CAST(GREATEST(1, octet_length(encode(text)) // 64) AS INT)
        |    AS n_frames,
        |  CAST(frame_index * 64 AS BIGINT) AS offset_bytes
        |FROM documents,
        |  LATERAL (SELECT unnest(range(0,
        |    GREATEST(1, octet_length(encode(text)) // 64), 2))
        |    AS frame_index) f
        |ORDER BY doc_id, frame_index""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) => StubDecoder.sampleFrames(id, bytes) }
        .toDF()
        .select(col("doc_id"), col("frame_index"), col("n_frames"),
          col("offset_bytes"))
        .orderBy(col("doc_id"), col("frame_index"))
    },

    // Scene-cut detection over the sampled frame sequence — the
    // temporal-structure pass a video pipeline runs right after
    // frame sampling: consecutive sampled frames with different
    // content digests mark a cut; per asset, the sampled-frame count,
    // cut count, and first cut position. The digest is the frame's
    // content md5 (same portable choice as mm_frame_dedup — the
    // imperative rolling checksum stays in the typed decode path),
    // and the sequence scan is one keyed LAG per asset.
    QuerySpec.sql(
      "mm_scene_cuts",
      """WITH f AS (
        |  SELECT doc_id, frame_index,
        |    md5(substr(text, CAST(frame_index * 64 + 1 AS INT), 64))
        |      AS fh
        |  FROM documents,
        |    LATERAL (SELECT unnest(range(0,
        |      GREATEST(1, octet_length(encode(text)) // 64), 2))
        |      AS frame_index) g),
        |l AS (
        |  SELECT doc_id, frame_index, fh,
        |    LAG(fh) OVER (PARTITION BY doc_id ORDER BY frame_index)
        |      AS ph
        |  FROM f)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |  CAST(COALESCE(SUM(CASE WHEN ph IS NOT NULL AND fh <> ph
        |    THEN 1 END), 0) AS BIGINT) AS n_cuts,
        |  CAST(MIN(CASE WHEN ph IS NOT NULL AND fh <> ph
        |    THEN frame_index END) AS BIGINT) AS first_cut_frame
        |FROM l GROUP BY 1
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val w = W.partitionBy(col("doc_id")).orderBy(col("frame_index"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          greatest(lit(1), expr("length(text) div 64")).as("nf"))
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0, CAST(nf - 1 AS INT), 2)"))
            .as("frame_index"))
        .select(col("doc_id"), col("frame_index"),
          md5(expr("substring(text, CAST(frame_index * 64 + 1 AS INT), 64)")
            .cast("binary")).as("fh"))
        .withColumn("ph", lag(col("fh"), 1).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"),
          coalesce(sum(when(col("ph").isNotNull &&
            col("fh") =!= col("ph"), 1L)), lit(0L)).as("n_cuts"),
          min(when(col("ph").isNotNull && col("fh") =!= col("ph"),
            col("frame_index").cast("long"))).as("first_cut_frame"))
        .orderBy(col("doc_id"))
    },

    // Perceptual-hash near-dup: media payloads fingerprinted with the
    // 64-bit blockhash stub, then paired by Hamming-LSH — candidates
    // share at least one of four 16-bit bands (any pair within
    // Hamming distance 3 MUST share a band; distance ≤ 6 is then
    // verified exactly with popcounts). The image-dedup analogue of
    // banded MinHash: band buckets are the shuffle keys, pair
    // generation is triangle-blocked so one hot bucket (e.g. the
    // all-zero band of blank media) cannot serialize into one task.
    QuerySpec.sql(
      "mm_phash_near_dup", {
        val bandExpr = (0 until 4).map { bi =>
          s"""CAST(COALESCE(SUM(CASE WHEN k // 16 = $bi
             |    THEN bit * CAST(POW(2, k % 16) AS BIGINT) END), 0)
             |    AS BIGINT) AS b$bi""".stripMargin
        }.mkString(",\n  ")
        s"""WITH b AS (
           |  SELECT doc_id, hex(encode(text)) AS h,
           |         octet_length(encode(text)) AS n
           |  FROM documents),
           |pos AS (
           |  SELECT doc_id, n, i,
           |    strpos('123456789ABCDEF', substr(h, 2*i+1, 1))*16 +
           |    strpos('123456789ABCDEF', substr(h, 2*i+2, 1)) AS byte
           |  FROM b, LATERAL (SELECT unnest(range(0, n)) AS i) t),
           |blk AS (
           |  SELECT doc_id, n, CAST(i * 64 // n AS INT) AS k,
           |    SUM(byte) AS bs, COUNT(*) AS bl
           |  FROM pos GROUP BY 1, 2, 3),
           |tot AS (SELECT doc_id, SUM(byte) AS ts FROM pos GROUP BY 1),
           |bits AS (
           |  SELECT blk.doc_id, k,
           |    CASE WHEN bs * n > ts * bl THEN 1 ELSE 0 END AS bit
           |  FROM blk JOIN tot ON tot.doc_id = blk.doc_id),
           |bands AS (
           |  SELECT b.doc_id,
           |  $bandExpr
           |  FROM b LEFT JOIN bits ON bits.doc_id = b.doc_id
           |  GROUP BY b.doc_id),
           |bexp AS (
           |  SELECT doc_id, 0 AS band, b0 AS val FROM bands
           |  UNION ALL SELECT doc_id, 1, b1 FROM bands
           |  UNION ALL SELECT doc_id, 2, b2 FROM bands
           |  UNION ALL SELECT doc_id, 3, b3 FROM bands),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           |  FROM bexp a JOIN bexp b
           |    ON a.band = b.band AND a.val = b.val
           |    AND a.doc_id < b.doc_id)
           |SELECT c.a_id, c.b_id,
           |  CAST(bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
           |    + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3))
           |    AS BIGINT) AS hamming,
           |  bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
           |    + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3))
           |    <= 6 AS is_near
           |FROM cand c
           |JOIN bands pa ON pa.doc_id = c.a_id
           |JOIN bands pb ON pb.doc_id = c.b_id
           |ORDER BY a_id, b_id""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      val bands = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          StubDecoder.phash(id, bytes)
        })
        .toDF()
        .cache()
      val bexp = bands.select(col("doc_id"),
        expr("stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band, val)"))
      val cand = graft.functions.Pairs.blockedSelfPairs(bexp,
          keyCols = Seq("band", "val"), idCol = "doc_id",
          payload = Seq.empty, blockSize = 10000)
        .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id"))
        .distinct()
      val ham = (0 until 4).map(i =>
          expr(s"bit_count(a_b$i ^ b_b$i)").cast("long"))
        .reduce(_ + _)
      cand
        .join(bands.select(col("doc_id").as("a_id") +:
          (0 until 4).map(i => col(s"b$i").as(s"a_b$i")): _*), Seq("a_id"))
        .join(bands.select(col("doc_id").as("b_id") +:
          (0 until 4).map(i => col(s"b$i").as(s"b_b$i")): _*), Seq("b_id"))
        .withColumn("hamming", ham)
        .select(col("a_id"), col("b_id"), col("hamming"),
          (col("hamming") <= 6).as("is_near"))
        .orderBy(col("a_id"), col("b_id"))
    })
}
