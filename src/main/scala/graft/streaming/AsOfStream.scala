package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment: incoming probe rows pick up the latest
  * at-or-before build value per key — the streaming counterpart of
  * [[graft.functions.AsOfJoin]] (rates onto a trade stream, reference
  * features onto an event stream).
  *
  * Scale design: the build side of an as-of enrichment is a slowly-
  * changing reference table (rates, dimensions) — broadcastable by the
  * same argument the batch plan broadcasts dimensions. It ships once
  * per executor as sorted per-key arrays; each arrival then resolves
  * with ONE binary search in a stateless map — no shuffle, no state
  * store, Append mode, per-batch cost exactly the rows it carries.
  * (An unbounded or fast-moving build side needs the batch merge join
  * instead; this is the broadcast-dimension regime.)
  */
object AsOfStream {

  final case class Probe(id: Long, key: Long, t: Long)
  final case class Enriched(id: Long, key: Long, t: Long,
      value: Option[Double])

  /** Default build-side row cap — the same order of magnitude Spark's
    * own autoBroadcastJoinThreshold implies for a dimension table.
    */
  val DefaultMaxBuildRows = 4000000

  /** Per-key (sorted times, values) index. Build from a DataFrame of
    * (key, t, value) rows; the build side must be unique per (key, t)
    * — pre-aggregate upstream, same contract as the batch join.
    *
    * The index lives on the driver and broadcasts to every executor,
    * so the build side MUST be dimension-sized. `maxRows` enforces
    * that contract loudly: the collect is bounded at maxRows + 1 rows
    * (so an unbounded build side cannot OOM the driver first) and an
    * over-limit build fails with a pointer to the batch merge join.
    */
  def buildIndex(build: DataFrame, keyCol: String, tCol: String,
      vCol: String, maxRows: Int = DefaultMaxBuildRows)
      : Map[Long, (Array[Long], Array[Double])] = {
    val rows = build.select(col(keyCol).cast("long"), col(tCol).cast("long"),
        col(vCol).cast("double"))
      .limit(maxRows + 1)
      .collect()
    require(rows.length <= maxRows,
      s"as-of build side exceeds $maxRows rows — this is the broadcast-" +
        "dimension regime; an unbounded build side needs the batch merge " +
        "join (graft.functions.AsOfJoin.asofBackward) instead")
    rows
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        val sorted = rs.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
        k -> (sorted.map(_._1), sorted.map(_._2))
      }
  }

  /** Greatest index i with ts(i) <= t, or -1. */
  private def floorIdx(ts: Array[Long], t: Long): Int = {
    var lo = 0
    var hi = ts.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ts(mid) <= t) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  /** Wire the enrichment over a (possibly streaming) probe set. */
  def enrich(spark: SparkSession, probes: Dataset[Probe],
      index: Broadcast[Map[Long, (Array[Long], Array[Double])]])
      : Dataset[Enriched] = {
    import spark.implicits._
    probes.map { p =>
      val v = index.value.get(p.key).flatMap { case (ts, vs) =>
        val i = floorIdx(ts, p.t)
        if (i < 0) None else Some(vs(i))
      }
      Enriched(p.id, p.key, p.t, v)
    }
  }
}
