package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-shape analysis over integer key columns: gaps-and-islands.
  * The reference's savepoint/resume machinery tracks contiguous ranges
  * of migrated tokens (savepoints/SavepointsManager + RangeSetAccumulator
  * — reference: migrator/.../Savepoints.scala); collapsing a key set into
  * maximal consecutive runs is the batch-analytics form of the same
  * question ("which id ranges are complete, where are the holes").
  */
object Sequences {

  /** Collapse the distinct values of an integer key column into maximal
    * runs of consecutive values: one row per island with
    * (island_start, island_end, island_len). NULL keys carry no
    * sequence position and are dropped (SQL semantics: NULL±1 is NULL,
    * so a NULL can neither start, end, nor extend a run).
    *
    * Plan shape: run STARTS are keys where k−1 is absent, run ENDS are
    * keys where k+1 is absent — two self-anti-joins, fully distributed,
    * shuffling only the key column. The i-th start then pairs with the
    * i-th end by rank. The classic `k − row_number()` grouping trick
    * needs one global total order over ALL keys (single-task sort at
    * scale); this form only ranks the island ENDPOINTS — two rows per
    * island, orders of magnitude fewer than the keys whenever islands
    * are wide.
    *
    * The endpoint rank itself is RANGE-SHARDED, never global: endpoints
    * are bucketed into `rankShards` contiguous key ranges, ranked inside
    * each shard by a PARTITIONED window, and offset by the endpoint
    * count of all lower shards. Shard offsets are a bounded driver
    * artifact (≤ 2·rankShards rows collected); because shards are
    * contiguous ranges, (shard, v) order equals global v order, so the
    * composed rank is exactly the global rank — with no single-task
    * sort anywhere in the plan. Keys may span the full Long range; ANSI
    * mode turns the (pathological) `v − lo` overflow into a loud error
    * rather than a silent mis-shard.
    */
  def islands(keys: DataFrame, keyCol: String, rankShards: Int = 64): DataFrame = {
    require(rankShards >= 1, s"rankShards must be >= 1, got $rankShards")
    val spark = keys.sparkSession
    val k = keys.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull).distinct()
    val starts = k.as("a")
      .join(k.as("b"), col("a.k") - 1 === col("b.k"), "left_anti")
      .select(col("k").as("v"))
    val ends = k.as("a")
      .join(k.as("b"), col("a.k") + 1 === col("b.k"), "left_anti")
      .select(col("k").as("v"))
    // materialize the tagged endpoint frame ONCE (`__t` 0 = start, 1 =
    // end): the anti-joins are the dominant cost and three separate
    // actions read this frame (bounds, shard counts, the final rank
    // join — the last twice). The checkpoint holds two rows per island
    // — endpoint-sized, not key-sized. Bounds come FROM the endpoints
    // (min start = min key, max end = max key), so no extra scan of k.
    // Block lifecycle (same contract as Dedup.keptFrame /
    // Similarity.semanticDedup): the returned frame READS these blocks,
    // so they stay pinned until session end unless the caller releases
    // them via GraftColumnBridge.unpersistLocalCheckpoint AFTER fully
    // consuming the result — they are the only copy of the endpoints.
    val endpoints0 = starts.withColumn("__t", lit(0))
      .unionByName(ends.withColumn("__t", lit(1)))
      .transform(graft.Checkpoints.materialize)
    val bounds = endpoints0.agg(
      min(when(col("__t") === 0, col("v"))),
      max(when(col("__t") === 1, col("v")))).head()
    if (bounds.isNullAt(0)) {
      org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(endpoints0)
      return k.select(col("k").as("island_start"), col("k").as("island_end"),
        col("k").as("island_len"))
    }
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val width = ((BigInt(hi) - BigInt(lo)) / rankShards + 1)
      .min(BigInt(Long.MaxValue)).toLong
    val endpoints = endpoints0
      .withColumn("__shard", expr(s"(v - ${lo}L) div ${width}L"))
    // bounded driver artifact: one row per (tag, non-empty shard)
    val counts = endpoints.groupBy(col("__t"), col("__shard"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    val offsets = counts.groupBy(_._1._1).toSeq.flatMap { case (_, perTag) =>
      var acc = 0L
      perTag.sortBy(_._1._2).map { case ((t, s), c) =>
        val row = (t, s, acc); acc += c; row
      }
    }
    val offsetsDf = spark.createDataFrame(offsets).toDF("__t", "__shard", "__offset")
    val w = Window.partitionBy(col("__t"), col("__shard")).orderBy(col("v"))
    val ranked = endpoints.join(broadcast(offsetsDf), Seq("__t", "__shard"))
      .select(col("__t"), col("v"),
        (row_number().over(w) + col("__offset")).as("rn"))
    ranked.filter(col("__t") === 0).select(col("v").as("island_start"), col("rn"))
      .join(ranked.filter(col("__t") === 1).select(col("v").as("island_end"), col("rn")), "rn")
      .select(col("island_start"), col("island_end"),
        (col("island_end") - col("island_start") + 1).as("island_len"))
  }
}
