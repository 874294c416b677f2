package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication for incremental corpus ingest: the
  * streaming form of `dedup_exact` (hash-groupBy on the content
  * digest). Documents arrive in micro-batches; the first document of
  * each content group is emitted as the keeper, later arrivals are
  * emitted flagged as duplicates of it.
  *
  * Scale design: state is keyed by the content digest — uniform
  * 128-bit keys, so state partitions evenly at any corpus size — and
  * each group's state is ONE small record (keeper id + count), not the
  * document text. A TTL variant would bound state for time-windowed
  * dedup; the default keeps global state like a warehouse-side dedup
  * table would.
  */
object DedupStream {

  /** Input: a document id plus its content digest (compute with
    * md5(lower(text)) upstream so the text itself never enters state).
    */
  final case class DocArrival(doc_id: Long, fp: String)

  /** Output decision for each arrival; `keep_id` is the group's
    * canonical (first-seen) document.
    */
  final case class DedupDecision(
      doc_id: Long,
      fp: String,
      keep_id: Long,
      duplicate: Boolean,
      n_seen: Long)

  /** Carried per-digest state. */
  final case class GroupSeen(keep_id: Long, n_seen: Long)

  def decide(
      fp: String,
      arrivals: Iterator[DocArrival],
      state: GroupState[GroupSeen]): Iterator[DedupDecision] = {
    var seen = state.getOption.getOrElse(GroupSeen(Long.MinValue, 0L))
    val out = arrivals.toSeq.sortBy(_.doc_id).map { a =>
      if (seen.n_seen == 0L) {
        seen = GroupSeen(a.doc_id, 1L)
        DedupDecision(a.doc_id, fp, a.doc_id, duplicate = false, seen.n_seen)
      } else {
        seen = seen.copy(n_seen = seen.n_seen + 1L)
        DedupDecision(a.doc_id, fp, seen.keep_id, duplicate = true, seen.n_seen)
      }
    }
    state.update(seen)
    out.iterator
  }

  /** Wire the stateful dedup over a (possibly streaming) arrival set. */
  def decisions(spark: SparkSession,
      arrivals: Dataset[DocArrival]): Dataset[DedupDecision] = {
    import spark.implicits._
    arrivals
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(decide)
  }

  /** Convenience: digest + dedup a raw (doc_id, text) set — the same
    * fingerprint as the batch `dedup_exact` gate.
    */
  def fromDocuments(spark: SparkSession,
      docs: Dataset[(Long, String)]): Dataset[DedupDecision] = {
    import spark.implicits._
    decisions(spark, docs
      .toDF("doc_id", "text")
      .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
      .as[DocArrival])
  }
}
