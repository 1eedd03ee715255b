package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * rows; bounds aggregate to a |groups|-row frame that joins back
  * (broadcast at any realistic group count); the clip itself is a
  * scan-side `least`/`greatest`. The window sort IS a per-group sort
  * — the exact tier's honest cost; for groups too large to sort,
  * route to KLL-sketch bounds (`functions/KllSketches`) and accept
  * the rank envelope instead of exactness.
  *
  * NULL values pass through unclipped (they carry no rank); groups
  * with n < 2k still clip to their own [k-th, n-k+1-th] — degenerate
  * but well-defined (lo may exceed hi only when n < 1, impossible).
  */
object Winsorize {

  def clipByRank(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 pct: Int, outCol: String): DataFrame = {
    require(pct >= 1 && pct <= 49, s"pct must be in [1, 49], got $pct")
    require(!df.columns.contains(outCol), s"$outCol already exists")
    Seq("__rn", "__n", "__lo", "__hi").foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by clipByRank"))
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
    df.join(broadcast(bounds), groupCols, "left")
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }
}
