package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MinHashSig

/** Streaming NEAR-duplicate detection for incremental corpus ingest:
  * the streaming form of banded MinHash-LSH. Each arriving document's
  * signature (computed by the codegen'd [[MinHashSig]] expression) is
  * split into bands; state is keyed by (band, band-key) and holds the
  * bucket's member ids, so a new arrival emits one candidate pair per
  * existing bucket member — exactly the pairs the batch banded join
  * would produce, discovered incrementally.
  *
  * Scale design: band keys are uniform hashes, so state partitions
  * evenly; each bucket's state is a bounded id list
  * ([[MaxBucketMembers]], the streaming analogue of the batch triangle
  * block bound — a degenerate bucket stops growing state instead of
  * growing without limit). Candidate pairs repeat across bands like
  * the batch path; consumers dedupe downstream.
  */
object NearDupStream {

  /** Number of minhash permutations / bands (matches the batch
    * defaults in DedupOps).
    */
  val NumHashes = 4
  val NumBands = 2

  /** Bound on remembered members per (band, key) bucket. */
  val MaxBucketMembers = 10000

  final case class BandArrival(doc_id: Long, band: Int, key: String)

  final case class CandidatePair(a_id: Long, b_id: Long, band: Int, key: String)

  final case class BucketMembers(members: List[Long])

  def pair(bandKey: (Int, String),
      arrivals: Iterator[BandArrival],
      state: GroupState[BucketMembers]): Iterator[CandidatePair] = {
    val (band, key) = bandKey
    var members = state.getOption.map(_.members).getOrElse(Nil)
    val out = Seq.newBuilder[CandidatePair]
    arrivals.toSeq.sortBy(_.doc_id).foreach { a =>
      members.foreach { m =>
        val (lo, hi) = if (m < a.doc_id) (m, a.doc_id) else (a.doc_id, m)
        if (lo != hi) out += CandidatePair(lo, hi, band, key)
      }
      if (members.size < MaxBucketMembers) members = a.doc_id :: members
    }
    state.update(BucketMembers(members))
    out.result().iterator
  }

  /** Band arrivals of a (possibly streaming) document set: signature →
    * one row per band with the band's key.
    */
  def bandArrivals(spark: SparkSession,
      docs: Dataset[(Long, String)]): Dataset[BandArrival] = {
    import spark.implicits._
    val r = NumHashes / NumBands
    val sig = MinHashSig.minhash_sig(col("text"), NumHashes)
    val bandKeys = (0 until NumBands).map { bi =>
      val slice = (bi * r until (bi + 1) * r)
        .map(i => col("sig").getItem(i))
      struct(lit(bi + 1).as("band"),
        concat_ws("|", slice: _*).as("key")).as(s"b$bi")
    }
    docs.toDF("doc_id", "text")
      .filter(length(col("text")) >= MinHashSig.ShingleWidth)
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), explode(array(bandKeys: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
      .as[BandArrival]
  }

  /** Wire the stateful pairing over band arrivals. */
  def candidates(spark: SparkSession,
      docs: Dataset[(Long, String)]): Dataset[CandidatePair] = {
    import spark.implicits._
    bandArrivals(spark, docs)
      .groupByKey(a => (a.band, a.key))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(pair)
  }
}
