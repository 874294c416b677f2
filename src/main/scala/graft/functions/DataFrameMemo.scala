package graft.functions

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single-flight (session, dir)-keyed memo for materialized
  * DataFrames — the shared lifecycle behind the write-once artifact
  * tables (cluster labels, k-means centroids, undirected k-NN edges,
  * n-gram Jaccard pairs).
  *
  * Two hazards the raw `TrieMap.getOrElseUpdate` spelling had:
  *
  *  - **double build**: `getOrElseUpdate`'s thunk can run more than
  *    once under concurrent first access (only one result is kept) —
  *    a losing builder's `Materialize.stable` rounds would leave
  *    orphaned checkpoint/cache data no reference ever reaches. The
  *    build here runs under a lock, so exactly one builder runs per
  *    key; the common warm-path read stays lock-free.
  *  - **leaked cache on clear**: removing the map entry released only
  *    the driver-side reference; a `.cache()`d entry stayed pinned in
  *    executor memory for the session lifetime. [[clear]] now
  *    unpersists each removed DataFrame (a no-op for uncached ones).
  *    Checkpoint FILES are not deleted — that remains the session-
  *    level `spark.cleaner.referenceTracking.cleanCheckpoints`
  *    contract documented on [[Materialize]].
  */
final class DataFrameMemo {
  private val map = TrieMap[(SparkSession, String), DataFrame]()
  private val buildLock = new Object

  /** The memoized entry for (s, dir), building it under the
    * single-flight lock on first access.
    */
  def getOrBuild(s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    map.get((s, dir)).getOrElse(buildLock.synchronized {
      map.getOrElseUpdate((s, dir), build)
    })

  /** Drop all entries of `session` (every entry when None) and
    * unpersist their cached blocks. Non-blocking: executor block
    * eviction proceeds asynchronously.
    */
  def clear(session: Option[SparkSession]): Unit = buildLock.synchronized {
    map.keys
      .filter(k => session.forall(_ eq k._1))
      .foreach(k => map.remove(k).foreach(_.unpersist(blocking = false)))
  }
}
