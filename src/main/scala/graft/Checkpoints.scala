package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for the iterative tiers (Dedup LSH/label
  * propagation, Similarity.semanticDedup, Sequences.islands,
  * HashRefinement).
  *
  * Default: `localCheckpoint()` — materializes to executor-local
  * storage blocks, no filesystem round-trip, the fast choice for a
  * bounded pass. Its documented trade-off is resilience: the blocks
  * are the ONLY copy, so an executor loss mid-pipeline FAILS the job
  * instead of recomputing. On a multi-hour 100-TB dedup run that
  * trade is wrong — one preempted executor must not kill the pass.
  *
  * Escape hatch: set the session conf [[Checkpoints.DirKey]]
  * (`spark.graft.checkpoint.dir`) to a fault-tolerant path (HDFS/S3)
  * and every tier that calls [[materialize]] switches to reliable
  * `checkpoint()` — the rows land on the shared filesystem, executor
  * loss re-reads them, and lineage is truncated exactly the same way.
  * Results are identical by construction (both forms materialize the
  * same plan; DedupSpec asserts label equality across the two modes).
  *
  * Lifecycle: superseded local checkpoints are released per round via
  * `GraftColumnBridge.unpersistLocalCheckpoint` (a no-op on reliable
  * checkpoint leaves — their backing is files, not storage blocks).
  * Reliable checkpoint files accumulate under the configured dir for
  * the session; Spark removes them when the RDD is GC'd if
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, otherwise
  * clean the directory after the run — they are scratch, not state.
  */
object Checkpoints {

  /** Session conf key: a fault-tolerant directory for reliable
    * checkpoints. Unset/empty = executor-local checkpoints (default).
    */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Materialize `df` and truncate its lineage, per the session's
    * checkpoint policy (eager in both modes — callers rely on the
    * materialization job running HERE, e.g. to ride `observe()`
    * metrics or to stop a self-join from recomputing its input).
    */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call — only
        // (re)set when the configured root actually changed, so one
        // session's checkpoints share a directory
        if (!sc.getCheckpointDir.exists(_.startsWith(dir))) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None =>
        df.localCheckpoint()
    }
  }
}
