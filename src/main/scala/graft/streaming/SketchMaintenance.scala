package graft.streaming

import org.apache.spark.sql.DataFrame

/** Incremental sketch-artifact maintenance: keep a parquet store of
  * per-group sketch rows (HLL / KLL / theta — anything with a
  * union-style merge) up to date as data streams in, so any-range
  * distinct/quantile/set-algebra questions are answerable at ANY time
  * from the store alone, never by rescanning the raw feed.
  *
  * The streaming twin of the persisted IVF/PQ/LM models: per batch,
  * build partials over JUST the new rows, union them with the stored
  * rows, re-merge per group, swap the store atomically (SwapStore —
  * the CDC target's crash discipline). Mergeability makes the result
  * independent of batch cuts, and replays are absorbed for
  * set-semantics sketches (HLL/theta: re-adding a value is a no-op) —
  * stream-sketch equals batch-sketch exactly there; KLL counts
  * duplicates, so its store is at-least-once like the CDC apply and
  * the envelope contract is the guarantee that survives a replay.
  *
  * Scale shape: the batch scan reduces to |groups in batch| sketch
  * rows; the store merge touches |store| + |batch groups| sketch rows
  * — never raw history. At warehouse scale the store is itself
  * partitioned (e.g. by day) and only touched partitions re-merge.
  */
object SketchMaintenance {

  /** One maintenance step (call from `foreachBatch`, or from a batch
    * backfill loop — same semantics both ways).
    *
    * @param batchPartials per-group sketch rows over the NEW data only
    *   (e.g. `KllSketches.partials(batch, groups, col)`)
    * @param storePath parquet artifact store (created on first batch)
    * @param groups the store's group columns
    * @param merge sketch-family rollup, e.g. `HllSketches.mergeSketch`
    *   / `KllSketches.mergeSketch` / `ThetaSketches.mergeSketch`
    */
  def mergeIntoStore(batchPartials: DataFrame, storePath: String,
                     groups: Seq[String],
                     merge: (DataFrame, Seq[String]) => DataFrame): Unit = {
    val current = SwapStore.readCurrent(batchPartials.sparkSession, storePath,
      batchPartials.schema)
    SwapStore.swapWrite(merge(current.unionByName(batchPartials), groups), storePath)
  }
}
