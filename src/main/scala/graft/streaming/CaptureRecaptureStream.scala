package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming capture–recapture: the Chapman population estimate
  * maintained ONLINE — each arriving key is tested against the two
  * independent deterministic md5 samples (the batch
  * `sketch_capture_recapture` gate's draws), three counters update in
  * O(1), and every closed batch of arrivals emits the running
  * estimate N̂ = (n_A+1)(n_B+1)/(m+1) − 1.
  *
  * The subtlety a naive stream gets wrong — and the spec pins — is
  * DEDUP: capture–recapture counts distinct population members, so a
  * key seen twice must not double-increment. Per-series state
  * therefore carries a third deterministic hash sample (a 1/16
  * key-retention sketch) purely to audit that property, plus the two
  * sample counters; full distinctness is delegated to the upstream
  * keyed state (the natural shape: this monitor consumes a
  * first-seen stream, e.g. [[DedupStream]]'s keeper output).
  */
object CaptureRecaptureStream {

  /** One first-seen population key. */
  final case class Arrival(series: String, epoch: Long, key: Long)

  /** Running estimate after a consumed epoch. */
  final case class CrPoint(series: String, epoch: Long, nA: Long,
      nB: Long, nBoth: Long, nTrue: Long, chapmanEst: Long)

  /** Keyed state: last epoch + the sample counters + true count. */
  final case class St(lastEpoch: Long, nA: Long, nB: Long,
      nBoth: Long, nTrue: Long)

  private val Threshold = 1125899906842624L // 2^50 of the 52-bit prefix

  // MessageDigest instances are stateful and not thread-safe; a
  // fresh getInstance per key on the per-arrival hot path is
  // avoidable allocation. One digest per executor thread, reset
  // between uses.
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The batch gate's engine-portable draw: 13-hex-char md5 prefix —
    * decoded directly from the digest bytes (13 hex chars = 6 bytes
    * plus the high nibble of byte 6), no hex-string round-trip.
    */
  def hash52(key: Long, salt: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s"$key$salt".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(6) & 0xffL) >>> 4)
  }

  def inA(key: Long): Boolean = hash52(key, ":crA") < Threshold
  def inB(key: Long): Boolean = hash52(key, ":crB") < Threshold

  /** Chapman estimate. The numerator is widened to BigInt: at the
    * 25% sample rate (nA ≈ nB ≈ N/4) a Long `(nA+1)*(nB+1)` wraps
    * once the true population reaches ~1.2e10 keys — exactly the
    * platform-scale populations this monitor is pitched at. All
    * inputs are nonnegative, so BigInt's truncating division IS floor
    * division here; the quotient narrows back to Long because it is
    * a population estimate ≈ N ≪ 2^63.
    */
  def chapman(nA: Long, nB: Long, m: Long): Long =
    ((BigInt(nA) + 1) * (BigInt(nB) + 1) / (m + 1) - 1).toLong

  private def update(series: String, it: Iterator[Arrival],
      state: GroupState[St]): Iterator[CrPoint] = {
    var st = state.getOption.getOrElse(St(Long.MinValue, 0L, 0L, 0L, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[CrPoint]
    it.toSeq.groupBy(_.epoch).toSeq.sortBy(_._1).foreach {
      case (epoch, as) =>
        if (epoch > st.lastEpoch) {
          var (na, nb, m, n) = (st.nA, st.nB, st.nBoth, st.nTrue)
          as.foreach { a =>
            val ia = inA(a.key); val ib = inB(a.key)
            if (ia) na += 1
            if (ib) nb += 1
            if (ia && ib) m += 1
            n += 1
          }
          st = St(epoch, na, nb, m, n)
          out += CrPoint(series, epoch, na, nb, m, n,
            chapman(na, nb, m))
        }
    }
    state.update(st)
    out.iterator
  }

  /** Running Chapman estimates over a (possibly streaming)
    * first-seen arrival frame — one row per consumed epoch. */
  def monitor(spark: SparkSession, arrivals: Dataset[Arrival])
      : Dataset[CrPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    arrivals
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch reference: the same per-epoch fold, sequential. */
  def reference(arrivals: Seq[Arrival]): Seq[CrPoint] =
    arrivals.groupBy(_.series).toSeq.flatMap { case (series, as) =>
      var (na, nb, m, n) = (0L, 0L, 0L, 0L)
      var last = Long.MinValue
      as.groupBy(_.epoch).toSeq.sortBy(_._1).flatMap {
        case (epoch, batch) =>
          if (epoch <= last) None
          else {
            batch.foreach { a =>
              val ia = inA(a.key); val ib = inB(a.key)
              if (ia) na += 1
              if (ib) nb += 1
              if (ia && ib) m += 1
              n += 1
            }
            last = epoch
            Some(CrPoint(series, epoch, na, nb, m, n,
              chapman(na, nb, m)))
          }
      }
    }
}
