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
    * (island_start, island_end, island_len).
    *
    * Plan shape: run STARTS are keys where k−1 is absent, run ENDS are
    * keys where k+1 is absent — two self-anti-joins, fully distributed,
    * shuffling only the key column. The i-th start then pairs with the
    * i-th end by rank. The classic `k − row_number()` grouping trick
    * needs one global total order over ALL keys (single-task sort at
    * scale); this form only ranks the island ENDPOINTS — two rows per
    * island, orders of magnitude fewer than the keys whenever islands
    * are wide. The endpoint rank is still a global window: fine up to
    * millions of islands; shard it by key range and merge boundary
    * islands if a corpus ever produces more.
    */
  def islands(keys: DataFrame, keyCol: String): DataFrame = {
    val k = keys.select(col(keyCol).cast("long").as("k")).distinct()
    val starts = k.as("a")
      .join(k.as("b"), col("a.k") - 1 === col("b.k"), "left_anti")
      .select(col("k").as("island_start"))
    val ends = k.as("a")
      .join(k.as("b"), col("a.k") + 1 === col("b.k"), "left_anti")
      .select(col("k").as("island_end"))
    val byStart = Window.orderBy(col("island_start"))
    val byEnd = Window.orderBy(col("island_end"))
    starts.withColumn("rn", row_number().over(byStart))
      .join(ends.withColumn("rn", row_number().over(byEnd)), "rn")
      .select(col("island_start"), col("island_end"),
        (col("island_end") - col("island_start") + 1).as("island_len"))
  }
}
