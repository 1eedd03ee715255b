package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.KllSketches

/** Exact-rank winsorization: clip a value column to its group's
  * [k-th smallest, k-th largest] order statistics (k = ⌈n·pct/100⌉,
  * at least 1) — the robust outlier tamp feature pipelines apply
  * before aggregating heavy-tailed metrics. Exact by construction:
  * order statistics are well-defined under ties regardless of tie
  * order, so the result is engine/retry-invariant with NO floating
  * percentile interpolation (approx_percentile's bounds drift per
  * run; percentile's interpolation mixes doubles).
  *
  * Plan shape: ONE per-group window (row_number over the value order
  * + the group count riding the same shuffle) picks the two bound
  * rows; bounds aggregate to a |groups|-row frame that joins back;
  * the clip itself is a scan-side `least`/`greatest`. The bounds join
  * broadcasts only below `broadcastMaxGroups` distinct groups
  * (measured by a column-pruned limit probe, the same measure-then-
  * route shape as `AsOfJoinPlan`/`Dedup.hammingTopKAuto`) — a forced
  * broadcast of a hundred-million-group bounds frame would OOM the
  * driver where a shuffled join is fine.
  *
  * The window sort IS a per-group sort — the exact tier's honest
  * cost. For groups too large to sort, [[clipByQuantiles]] takes
  * KLL-sketch bounds instead (`functions/KllSketches`): map-side
  * sketch reduction, no per-group sort, rank-envelope accuracy
  * (exact while a group's sketch stays uncompacted, ~1% normalized
  * rank error at k=200 beyond).
  *
  * NULL values pass through unclipped (they carry no rank); groups
  * with n < 2k still clip to their own [k-th, n-k+1-th] — degenerate
  * but well-defined (lo may exceed hi only when n < 1, impossible).
  */
object Winsorize {

  def clipByRank(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 pct: Int, outCol: String,
                 broadcastMaxGroups: Int = 1000000): DataFrame = {
    validate(df, groupCols, pct, outCol)
    val groups = groupCols.map(col)
    val w = Window.partitionBy(groups: _*).orderBy(col(valueCol).asc)
    val wAll = Window.partitionBy(groups: _*)
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val k = greatest(ceil(col("__n") * pct / 100.0).cast("long"), lit(1L))
    val bounds = ranked
      .filter(col("__rn") === k || col("__rn") === col("__n") - k + 1)
      .groupBy(groups: _*)
      .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    clipJoin(df, bounds, groupCols, valueCol, outCol, broadcastMaxGroups)
  }

  /** Approximate winsorization for groups too large to sort: per-group
    * KLL sketches built with map-side partial merge (10× raw rows →
    * the same |groups| sketch rows before any shuffle) yield the
    * [pct, 100−pct] quantile bounds — no window, no per-group sort.
    * Bounds are actual retained data values (KLL quantiles never
    * interpolate), cast back to the value column's type, so the clip
    * stays type-exact; they agree with [[clipByRank]] exactly while a
    * group's values fit the sketch uncompacted and within KLL's
    * normalized-rank envelope beyond.
    */
  def clipByQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      pct: Int, outCol: String, sketchK: Int = 200,
                      broadcastMaxGroups: Int = 1000000): DataFrame = {
    validate(df, groupCols, pct, outCol)
    val valueType = df.schema(valueCol).dataType
    val parts = KllSketches.partials(
      df.filter(col(valueCol).isNotNull), groupCols, valueCol, sketchK)
    val bounds = parts
      .withColumn("__q", KllSketches.quantiles(col("kll_sketch"),
        Seq(pct / 100.0, 1.0 - pct / 100.0)))
      .select(groupCols.map(col) :+
        element_at(col("__q"), 1).cast(valueType).as("__lo") :+
        element_at(col("__q"), 2).cast(valueType).as("__hi"): _*)
    clipJoin(df, bounds, groupCols, valueCol, outCol, broadcastMaxGroups)
  }

  /** Join the |groups|-row bounds frame back and clip. NULL-SAFE on
    * the group keys: a NULL group is a group like any other (its
    * bounds row exists — window/groupBy both treat null as a value),
    * and a plain equi-join would silently leave the null group's
    * outliers unclipped. The broadcast hint is applied only when a
    * limit-probe confirms the distinct group count is under
    * `broadcastMaxGroups`; past that the plain join lets AQE pick the
    * strategy.
    */
  private def clipJoin(df: DataFrame, bounds: DataFrame, groupCols: Seq[String],
                       valueCol: String, outCol: String,
                       broadcastMaxGroups: Int): DataFrame = {
    val fits = df.select(groupCols.map(col): _*).distinct()
      .limit(broadcastMaxGroups + 1).count() <= broadcastMaxGroups
    val renamed = bounds.select(
      groupCols.map(c => col(c).as(s"__g_$c")) ++ Seq(col("__lo"), col("__hi")): _*)
    val boundsSide = if (fits) broadcast(renamed) else renamed
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(boundsSide, cond, "left")
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop(groupCols.map(c => s"__g_$c") ++ Seq("__lo", "__hi"): _*)
  }

  private def validate(df: DataFrame, groupCols: Seq[String], pct: Int,
                       outCol: String): Unit = {
    require(pct >= 1 && pct <= 49, s"pct must be in [1, 49], got $pct")
    require(!df.columns.contains(outCol), s"$outCol already exists")
    (Seq("__rn", "__n", "__lo", "__hi", "__q", "kll_sketch") ++
      groupCols.map(c => s"__g_$c")).foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by Winsorize"))
  }
}
