package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.Metric

/** Streaming maintenance of a plain-aggregate store — the
  * materialized-view twin of [[SketchMaintenance]]: each microbatch
  * (or backfill step) aggregates ONLY its own rows and merges into the
  * persisted per-key store via [[IncrementalAgg]], under the same
  * crash-safe read-modify-swap discipline ([[SwapStore]]).
  *
  * Unlike sketch partials, plain count/sum aggregates are NOT
  * replay-idempotent — a re-delivered batch would double-count. The
  * store therefore carries a `__last_batch` high-water column (the
  * same value on every row, riding the atomic swap): a batch whose id
  * is not greater is skipped, which under foreachBatch's
  * monotonically-increasing batch ids gives exactly-once absorption
  * across restarts. Limitation: a batch that contributes ZERO rows to
  * an EMPTY store leaves no row to carry the mark — its replay
  * re-absorbs nothing, so the guarantee is unaffected.
  */
object AggMaintenance {

  /** Absorb one batch; call from `foreachBatch((df, id) => ...)` or a
    * backfill loop with increasing ids. Returns true when absorbed,
    * false when skipped as a replay.
    */
  def mergeIntoStore(batch: DataFrame, batchId: Long, storePath: String,
                     keys: Seq[String], metrics: Seq[Metric]): Boolean = {
    val spark = batch.sparkSession
    val agged = IncrementalAgg.aggregate(batch, keys, metrics)
      .withColumn("__last_batch", lit(batchId))
    val store = SwapStore.readCurrent(spark, storePath, agged.schema)
    val lastSeen: Long =
      if (store.isEmpty) Long.MinValue
      else store.agg(max(col("__last_batch"))).head().getLong(0)
    if (batchId <= lastSeen) return false
    val merged =
      if (store.isEmpty) agged
      else IncrementalAgg.mergeDelta(
          store.drop("__last_batch"), agged.drop("__last_batch"),
          keys, metrics)
        .withColumn("__last_batch", lit(batchId))
    SwapStore.swapWrite(merged, storePath)
    true
  }

  /** Read the store without the bookkeeping column. Refreshes the
    * READER's file-listing cache first — the swaps may have happened
    * on a different session (foreachBatch clones), whose refresh
    * cannot evict this session's stale listing.
    */
  def readStore(spark: org.apache.spark.sql.SparkSession, storePath: String): DataFrame = {
    spark.catalog.refreshByPath(storePath)
    spark.read.parquet(storePath).drop("__last_batch")
  }
}
