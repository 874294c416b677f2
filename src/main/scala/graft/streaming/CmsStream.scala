package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.TextOps

/** Streaming count-min sketch: the fixed-size mergeable frequency
  * state maintained incrementally — the streaming counterpart of the
  * batch `sketch_cms_topk` gate. State is d rows of w counters
  * (1 024 longs total) at ANY vocabulary size; merge across
  * shards/streams is plain elementwise addition, the property that
  * lets partial sketches combine map-side at 100 TB (an exact
  * per-token count table's state is the vocabulary itself).
  *
  * Sharding: the sketch key is the hash ROW index — the d rows are
  * independent (each sees every token under its own hash), so they
  * maintain their counter vectors in parallel as d keyed-state groups
  * and never need a cross-row merge; est(t) = min over the d row
  * states of counts(slot(i, t)), exactly the batch estimator.
  * CmsStreamSpec proves the streamed counters equal the batch counter
  * matrix after any prefix, and that counters merge by addition.
  */
object CmsStream {

  final case class CmsDoc(doc_id: Long, text: String)

  /** One hash row's counter vector after `seq` micro-batches;
    * `n_total` = tokens seen (identical across rows — every row sees
    * the full stream).
    */
  final case class CmsRowSketch(row: Int, seq: Long, n_total: Long,
      counts: Seq[Long])

  final case class CmsRowState(seq: Long, n_total: Long, counts: Seq[Long])

  /** The batch gate's slot hash, replicated exactly: row i reads the
    * 13 hex chars (52 bits) at offset 4i of ONE md5(token) digest,
    * parsed base-16, mod w — the derived-multi-hash scheme (one
    * digest funds all d rows; the batch plan pays one md5 per token
    * occurrence instead of d).
    */
  def slot(row: Int, tok: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(4 * row, 4 * row + 13), 16) %
      TextOps.CmsWidth).toInt
  }

  /** Batch-identical tokenization: split on single spaces, empty
    * splits kept (Spark SQL `split` semantics).
    */
  def tokens(text: String): Seq[String] =
    text.split(" ", -1).toSeq

  private def update(row: Int, docs: Iterator[CmsDoc],
      state: GroupState[CmsRowState]): CmsRowSketch = {
    val prev = state.getOption.getOrElse(
      CmsRowState(0L, 0L, Seq.fill(TextOps.CmsWidth)(0L)))
    val counts = prev.counts.toArray
    var n = prev.n_total
    docs.foreach { d =>
      tokens(d.text).foreach { t =>
        counts(slot(row, t)) += 1L
        n += 1L
      }
    }
    state.update(CmsRowState(prev.seq + 1, n, counts.toSeq))
    CmsRowSketch(row, prev.seq + 1, n, counts.toSeq)
  }

  /** Incrementally-maintained per-row counter vectors over a (possibly
    * streaming) frame of documents. Update mode: the row with the
    * greatest `seq` per hash row is the current sketch. Each document
    * is fanned out to all d hash rows before the keyed shuffle — the
    * per-row groups then update independently.
    */
  def sketches(spark: SparkSession, docs: Dataset[CmsDoc])
      : Dataset[CmsRowSketch] = {
    import spark.implicits._
    docs
      .flatMap(d => (0 until TextOps.CmsDepth).map(i => i -> d))
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (row: Int, it: Iterator[(Int, CmsDoc)], st: GroupState[CmsRowState]) =>
          update(row, it.map(_._2), st)
      }
  }

  /** The batch estimator over final row states: est(t) = min over
    * rows of counts(slot(row, t)).
    */
  def estimate(rows: Map[Int, Seq[Long]], tok: String): Long =
    rows.map { case (i, counts) => counts(slot(i, tok)) }.min
}
