package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** Streaming maintenance of an SCD2 version-history store — the
  * dimension-history twin of [[AggMaintenance]]: each microbatch of
  * change-log ops absorbs into the persisted history via
  * `Scd2.appendToHistory` (untouched keys pass through, affected keys
  * rebuild exactly), under the [[SwapStore]] crash discipline, with
  * the same `__last_batch` high-water column for exactly-once
  * absorption across restarts (replaying ops into a history would
  * manufacture duplicate versions).
  *
  * This closes the CDC triangle: `CdcApply` maintains latest-state,
  * [[SketchMaintenance]]/[[AggMaintenance]] maintain summaries, and
  * this maintains the FULL validity history — all three drivable from
  * the same `foreachBatch` over one change stream.
  *
  * Ordering contract: a key's ops must not arrive in a batch EARLIER
  * than ops already absorbed for that key carry later timestamps —
  * the usual per-key in-order delivery of a keyed CDC source. (The
  * underlying appendToHistory is exact even for out-of-order
  * batches, so violations degrade nothing; the contract matters only
  * for reading the history between batches.)
  */
object HistoryMaintenance {

  /** Absorb one microbatch of ops. Returns true when absorbed, false
    * when skipped as a replay.
    */
  def mergeIntoStore(batchOps: DataFrame, batchId: Long, storePath: String,
                     key: String, tsCol: String, opCol: String,
                     upsertOp: String, deleteOp: String, valueCols: Seq[String],
                     tieBreak: Seq[String] = Nil): Boolean = {
    val spark = batchOps.sparkSession
    val emptyHistory = Scd2.buildHistory(batchOps.filter(lit(false)),
      key, tsCol, opCol, upsertOp, deleteOp, valueCols, tieBreak.map(col))
    val storeSchema = emptyHistory.withColumn("__last_batch", lit(0L)).schema
    val store = SwapStore.readCurrent(spark, storePath, storeSchema)
    val lastSeen: Long =
      if (store.isEmpty) Long.MinValue
      else store.agg(max(col("__last_batch"))).head().getLong(0)
    if (batchId <= lastSeen) return false
    val history = store.drop("__last_batch")
    val next = Scd2.appendToHistory(history, batchOps, key, tsCol, opCol,
        upsertOp, deleteOp, valueCols, tieBreak)
      .withColumn("__last_batch", lit(batchId))
    SwapStore.swapWrite(next, storePath)
    true
  }

  /** Read the history store without the bookkeeping column (refreshes
    * this session's listing cache — swaps may have happened on a
    * foreachBatch clone).
    */
  def readStore(spark: org.apache.spark.sql.SparkSession, storePath: String): DataFrame = {
    spark.catalog.refreshByPath(storePath)
    spark.read.parquet(storePath).drop("__last_batch")
  }
}
