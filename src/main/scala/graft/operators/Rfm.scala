package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) customer scoring — the
  * segmentation table behind lifecycle marketing and churn models.
  * One aggregation reduces the event log to a |keys|-row frame:
  *
  *  - `recency_days`  — whole days from the key's LAST event to `asOf`
  *    (exact integer epoch-day math, engine-portable),
  *  - `frequency`     — event count,
  *  - `monetary`      — Σ value, summed as DECIMAL per repo convention
  *    and emitted as DOUBLE,
  *  - `r_score` / `f_score` / `m_score` — ntile(buckets) ranks where
  *    score 1 is BEST (most recent / most frequent / highest spend),
  *    ties broken by key so the scores are deterministic.
  *
  * Scale note: the three ntile windows are GLOBAL sorts — fine on the
  * post-aggregation |keys| frame (orders of magnitude below the log),
  * the classic quantile-scoring trade-off. When |keys| itself outgrows
  * a single sort task, swap ntile for percentile-cutoff assignment
  * (the `pplBucketsApprox` pattern: one approx-quantile aggregate
  * broadcast back, bucket assigned scan-side).
  */
object Rfm {

  def scores(events: DataFrame, key: String, tsCol: String, valueCol: String,
             asOf: Column, buckets: Int = 5): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    Seq("recency_days", "frequency", "monetary", "r_score", "f_score", "m_score")
      .foreach(c => require(!events.columns.contains(c),
        s"$c is an Rfm output column — rename the input's first"))
    val base = events.groupBy(col(key)).agg(
      datediff(to_date(asOf), to_date(max(col(tsCol)))).cast("long").as("recency_days"),
      count(lit(1)).as("frequency"),
      sum(col(valueCol).cast("decimal(28,4)")).cast("double").as("monetary"))
    def tile(order: Seq[Column]) = ntile(buckets).over(Window.orderBy(order: _*)).cast("long")
    base
      .withColumn("r_score", tile(Seq(col("recency_days").asc, col(key).asc)))
      .withColumn("f_score", tile(Seq(col("frequency").desc, col(key).asc)))
      .withColumn("m_score", tile(Seq(col("monetary").desc, col(key).asc)))
  }
}
