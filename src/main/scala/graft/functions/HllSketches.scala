package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches as persistable artifacts: build
  * per-group HLL sketches once (e.g. one per day/partition), store them
  * as a binary column in the warehouse, and answer any-range distinct
  * questions later by UNIONING the stored sketches — no rescan of the
  * raw data. The incremental-analytics twin of the IVF/PQ/LM model
  * persistence: compute-once, re-attach forever.
  *
  * Uses Spark's native DataSketches HLL aggregates (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`) — codegen'd, map-side
  * partial, and the sketch binary is the STANDARD DataSketches wire
  * format, readable by any DataSketches binding, not a private blob.
  *
  * Shape at scale: the raw scan reduces to |groups| sketch rows
  * (lgK=12 ≈ 2.5 KB each) in one aggregation; every later merge works
  * on sketch rows only. Error is the HLL envelope (~1.04/√2^lgK ≈ 1.6%
  * at lgK=12), pinned by spec the same way as q_approx_distinct.
  */
object HllSketches {

  /** One sketch row per group: `groups..., hll_sketch BINARY`. Persist
    * with a plain parquet write; round-trips byte-exactly (spec'd).
    */
  def partials(df: DataFrame, groups: Seq[String], valueCol: String,
               lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    require(!df.columns.contains("hll_sketch"),
      "hll_sketch is the partials output column — rename the input's first")
    df.groupBy(groups.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))
  }

  /** Merge stored sketch rows up to a coarser grouping and estimate:
    * `by..., n_distinct_est BIGINT`. Register-wise union: the merged
    * estimate carries the SAME error envelope as a one-pass sketch of
    * the unioned rows (the union target's register representation may
    * differ internally, so the two estimates agree within the
    * envelope, not bit-for-bit — spec'd both ways against exact).
    */
  def mergeEstimate(partials: DataFrame, by: Seq[String],
                    sketchCol: String = "hll_sketch"): DataFrame =
    partials.groupBy(by.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("n_distinct_est"))

  /** Union stored sketch rows up to a coarser grouping, keeping the
    * RESULT a sketch (`by..., hll_sketch BINARY`) — the rollup form for
    * artifact maintenance (incremental stores re-merge per batch; only
    * the final read calls [[mergeEstimate]]).
    */
  def mergeSketch(partials: DataFrame, by: Seq[String],
                  sketchCol: String = "hll_sketch"): DataFrame =
    partials.groupBy(by.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(false)).as("hll_sketch"))
}
