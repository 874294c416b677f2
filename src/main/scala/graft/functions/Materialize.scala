package graft.functions

import org.apache.spark.sql.DataFrame

/** Plan-truncating materialization for iterative / two-pass
  * algorithms ([[PrefixSum]], [[ConnectedComponents]]).
  *
  * Both call sites need a DataFrame whose (a) lineage is cut so
  * per-round plans don't grow, and (b) partition assignment is frozen
  * so a second action can't re-sample range bounds. Two mechanisms
  * provide that, with a fault-tolerance trade-off:
  *
  *  - `df.checkpoint(eager = true)` writes to the RELIABLE checkpoint
  *    directory (HDFS/S3 at cluster scale): an executor loss is
  *    recoverable, at the cost of a distributed write per call. Used
  *    whenever `spark.sparkContext.getCheckpointDir` is set — which a
  *    100 TB deployment should always do.
  *  - `df.localCheckpoint(eager = true)` keeps blocks executor-local
  *    and NON-replicated: fast (no remote write), but losing any
  *    executor makes downstream stages unrecoverable — the job fails
  *    and must be rerun, since truncated lineage cannot recompute.
  *    Acceptable for local mode and short-lived jobs; the fallback
  *    here.
  *
  * Both are EAGER: truncation runs a job at call time even if the
  * result is never consumed. That is deliberate — eagerness is what
  * lets callers unpersist their upstream caches immediately instead
  * of leaking them for the session lifetime (the alternative, lazy
  * checkpoint + upstream cache kept alive, trades a bounded job for
  * an unbounded memory hold).
  *
  * Checkpoint retention: Spark does NOT delete reliable checkpoints
  * when their RDDs are collected unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` — a
  * long-lived session iterating many fixpoints (one checkpoint per
  * ConnectedComponents round) otherwise accumulates unbounded
  * checkpoint files on HDFS/S3. Cluster deployments should set that
  * flag alongside the checkpoint dir; superseded per-round checkpoints
  * are then collected as each round's RDD goes out of scope.
  */
object Materialize {

  /** Cut lineage and pin partitions of `df`, reliably if the session
    * has a checkpoint dir, executor-locally otherwise.
    */
  def stable(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
