package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** Streaming benchmark decontamination for incremental corpus ingest:
  * the streaming form of the batch `decontaminate` gate. Incoming
  * documents are checked against the held-out eval set's word-n-gram
  * inventory as they arrive; each emits a verdict row.
  *
  * Scale design: the eval side of decontamination is a BENCHMARK —
  * bounded by construction (a few million n-grams even for large eval
  * suites), which is why the batch plan broadcast-joins it. Here the
  * same inventory ships once per executor as a broadcast variable and
  * the per-document check is a STATELESS map: no shuffle, no state
  * store, Append output mode — each micro-batch's cost is exactly the
  * documents it carries. (A growing eval set would re-broadcast per
  * query restart; the inventory is immutable in practice.)
  */
object DecontaminateStream {

  final case class DocText(doc_id: Long, text: String)

  /** Verdict per arriving document: how many of its distinct word
    * n-grams appear in the eval inventory.
    */
  final case class ContamVerdict(
      doc_id: Long,
      n_shared: Long,
      contaminated: Boolean)

  /** Distinct word n-grams of a whitespace-tokenized text — the same
    * shingling as the batch gate (split on single space, n-token
    * windows joined by one space).
    */
  def grams(text: String, n: Int): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) Set.empty
    else (0 to toks.length - n).view
      .map(i => toks.slice(i, i + n).mkString(" ")).toSet
  }

  /** Wire the check over a (possibly streaming) document set against a
    * broadcast eval inventory (build it with [[grams]] over the eval
    * documents, or load a published benchmark n-gram list).
    */
  def verdicts(spark: SparkSession, docs: Dataset[DocText],
      evalGrams: Broadcast[Set[String]], n: Int): Dataset[ContamVerdict] = {
    import spark.implicits._
    docs.map { d =>
      val shared = grams(d.text, n).count(evalGrams.value.contains)
      ContamVerdict(d.doc_id, shared.toLong, shared > 0)
    }
  }
}
