package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view delta
  * update: a persisted per-key aggregate table absorbs an append batch
  * by aggregating ONLY the batch and merging, never rescanning the
  * base. At 100 TB this is the difference between a daily job that
  * costs a day's data and one that costs the table; it generalizes the
  * sketch-store maintenance tier (`streaming/SketchMaintenance`) from
  * sketch columns to plain algebraic aggregates.
  *
  * Supported aggregates are the self-mergeable (commutative-monoid)
  * ones under APPEND-ONLY deltas: count, sum, min, max (avg = merged
  * sum/count at read time). Deletes/updates are NOT absorbable —
  * min/max lose the information needed to retract (the classic
  * non-invertibility); route mutable sources through a snapshot diff
  * (`CdcApply.changesBetween`) into a full re-aggregate of affected
  * keys instead.
  *
  * Merge contract (`mergeDelta(store, deltaAggregated)`): both frames
  * carry (keys…, m₁…mₙ) with identical schemas; output re-aggregates
  * the union with each metric's own merge function — one |keys|-sized
  * hash aggregate over store ∪ delta-aggregate, both already
  * aggregate-sized. `aggregate(delta)` builds the delta's aggregate
  * frame with the same spec, so `mergeDelta(aggregate(a), aggregate(b))
  * == aggregate(a ∪ b)` row-for-row (the law the spec asserts).
  */
object IncrementalAgg {

  sealed trait Metric {
    def as: String
    /** aggregate raw rows → metric */
    private[IncrementalAgg] def build: Column
    /** merge two metric values (aggregate over the union frame) */
    private[IncrementalAgg] def merge: Column
  }
  final case class CountRows(as: String) extends Metric {
    private[IncrementalAgg] def build = count(lit(1)).as(as)
    private[IncrementalAgg] def merge = sum(col(as)).as(as)
  }
  final case class SumOf(c: String, as: String) extends Metric {
    private[IncrementalAgg] def build = sum(col(c)).as(as)
    private[IncrementalAgg] def merge = sum(col(as)).as(as)
  }
  final case class MinOf(c: String, as: String) extends Metric {
    private[IncrementalAgg] def build = min(col(c)).as(as)
    private[IncrementalAgg] def merge = min(col(as)).as(as)
  }
  final case class MaxOf(c: String, as: String) extends Metric {
    private[IncrementalAgg] def build = max(col(c)).as(as)
    private[IncrementalAgg] def merge = max(col(as)).as(as)
  }

  private def checkSpec(keys: Seq[String], metrics: Seq[Metric]): Unit = {
    require(keys.nonEmpty, "need at least one key column")
    require(metrics.nonEmpty, "need at least one metric")
    val names = keys ++ metrics.map(_.as)
    require(names.distinct.size == names.size,
      s"key/metric output names collide: $names")
  }

  /** Aggregate raw rows to the store layout (keys…, metrics…). */
  def aggregate(df: DataFrame, keys: Seq[String], metrics: Seq[Metric]): DataFrame = {
    checkSpec(keys, metrics)
    val aggs = metrics.map(_.build)
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a persisted store with an aggregated delta (both in store
    * layout). Keys present on one side only pass through; shared keys
    * merge metric-wise. Cost: one hash aggregate over two
    * aggregate-sized frames.
    */
  def mergeDelta(store: DataFrame, deltaAgg: DataFrame, keys: Seq[String],
                 metrics: Seq[Metric]): DataFrame = {
    checkSpec(keys, metrics)
    val want = (keys ++ metrics.map(_.as)).toSet
    for (side <- Seq(store, deltaAgg))
      require(side.columns.toSet == want,
        s"store layout mismatch: expected $want, got ${side.columns.toSet}")
    val merges = metrics.map(_.merge)
    store.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*).agg(merges.head, merges.tail: _*)
  }

  /** Convenience: absorb a RAW delta batch into the store. */
  def absorb(store: DataFrame, rawDelta: DataFrame, keys: Seq[String],
             metrics: Seq[Metric]): DataFrame =
    mergeDelta(store, aggregate(rawDelta, keys, metrics), keys, metrics)
}
