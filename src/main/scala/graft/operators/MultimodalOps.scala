package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * distributed batches.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB (`StubDecoder`) — but the
  * Spark-side plumbing is real and tested: binary column handling,
  * per-partition batched decode (mapPartitions — the Scala analogue of
  * mapInPandas batch shape), fixed-shape feature schema, and a SQL
  * metadata path. `documents.text` stands in for the media bytes.
  *
  * Scale: decode is embarrassingly parallel per partition; feature
  * vectors are fixed-width so downstream similarity joins partition
  * uniformly. A real deployment swaps StubDecoder for a codec without
  * touching the plan shape.
  */
object MultimodalOps {

  /** Typed output row of the decode stage. */
  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      feature: Array[Double])

  /** STUB: deterministic fake "decode + feature extraction" over raw
    * bytes. Stands in for an image/audio decoder (none in-container);
    * the output shape (dims + fixed-length feature vector) is what a
    * real decoder would produce.
    */
  object StubDecoder {
    val FeatureDim = 8

    def decode(docId: Long, bytes: Array[Byte]): MediaFeature = {
      val n = bytes.length
      val feature = new Array[Double](FeatureDim)
      var i = 0
      while (i < n) {
        feature(i % FeatureDim) += (bytes(i) & 0xff).toDouble
        i += 1
      }
      var j = 0
      while (j < FeatureDim) { feature(j) = feature(j) / math.max(n, 1); j += 1 }
      MediaFeature(docId, n, 16 + n % 64, 16 + n % 48, 3, feature)
    }
  }

  def specs: Seq[QuerySpec] = Seq(
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

    // Decode path (not SQL-expressible → rows-only check): binary
    // column → per-partition batched stub decode → typed features.
    // The feature vector is emitted as fixed scalar columns f0..f7 (not
    // array<double>) so downstream row hashing/sorting sees plain
    // sortable scalars.
    QuerySpec.rowsOnly("mm_decode_stub") { (s, dir) =>
      import s.implicits._
      val bin = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      val decoded = bin.mapPartitions { batch =>
        // batched decode: one decoder instance per partition, streaming
        // through the rows (the mapInPandas batch shape).
        batch.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
      }.toDF()
      val featCols = (0 until StubDecoder.FeatureDim).map { i =>
        // micro-unit quantization keeps the scalar exactly reproducible
        round(col("feature").getItem(i) * 1e6).cast("long").as(s"f$i")
      }
      decoded
        .select(Seq(col("doc_id"), col("n_bytes"), col("width"),
          col("height"), col("channels")) ++ featCols: _*)
        .orderBy(col("doc_id"))
    })
}
