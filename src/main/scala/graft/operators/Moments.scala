package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-relative outlier detection from exact integer moments — the
  * length/score screens of corpus curation ("drop documents whose
  * length is wildly atypical FOR THEIR SOURCE", not against one global
  * threshold that a mixed corpus would mis-apply to every domain).
  *
  * Determinism discipline: a naive `avg`/`stddev` aggregate sums
  * DOUBLES, and a float sum is partition-order dependent — the flagged
  * set could differ across retries. Here the aggregation computes only
  * INTEGER sufficient statistics (n, Σv, Σv²) — exact in any order —
  * and the mean/variance math happens per-row, after the aggregate, as
  * a fixed IEEE expression sequence. Same inputs + same op order =
  * identical doubles on every engine, so the flag is reproducible and
  * oracle-portable (the SQL mirror must use the same parenthesisation;
  * see q_len_outliers).
  */
object Moments {

  /** Flag rows whose integer `valueCol` deviates from its group mean by
    * more than `z` population standard deviations: keep the rows where
    * (v − mean)² > z² · var. Variance is the population form
    * Σv²/n − mean², derived per-row from the integer sums. A
    * single-row group has zero variance — its row is never an outlier
    * (dev² > 0 is false only when dev = 0 ... a 1-row group has
    * dev = 0 exactly), matching the intuition that "atypical" needs a
    * population to be atypical against.
    *
    * Plan shape at 100 TB: one count/sum aggregation over the group key
    * (|groups| rows, broadcast back) and a scan-side filter — the data
    * rows never shuffle. Σv² of a 64-bit value can overflow Long under
    * ANSI for |group| · v² ≳ 9e18; values here are document lengths
    * (≤ ~1e6), safe to ~1e6 rows × (1e6)² — beyond that, pre-cast
    * `valueCol` to DECIMAL at the call site.
    */
  def flagOutliers(df: DataFrame, valueCol: String, groupCol: String,
                   z: Double, flagName: String = "is_outlier"): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    require(!df.columns.contains(flagName),
      s"input already has a '$flagName' column — pass a different flagName")
    val reserved = Seq("__grp_key", "__grp_n", "__grp_sum", "__grp_sumsq", "n_group")
    require(!df.columns.exists(reserved.contains),
      s"columns ${reserved.mkString(", ")} are reserved by the moments join")
    val v = col(valueCol).cast("long")
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__grp_n"),
        sum(v).as("__grp_sum"),
        sum(v * v).as("__grp_sumsq"))
      .withColumnRenamed(groupCol, "__grp_key")
    // per-row IEEE sequence — mirror it op-for-op in any oracle:
    //   mean = sum / n;  var = sumsq / n - mean * mean
    //   outlier ⇔ (v - mean)² > z² · var
    val n = col("__grp_n").cast("double")
    val mean = col("__grp_sum").cast("double") / n
    val variance = col("__grp_sumsq").cast("double") / n - mean * mean
    val dev = v.cast("double") - mean
    df.join(broadcast(stats), col(groupCol) <=> col("__grp_key"))
      .withColumn(flagName, dev * dev > lit(z * z) * variance)
      .drop("__grp_key", "__grp_sum", "__grp_sumsq")
      .withColumnRenamed("__grp_n", "n_group")
  }
}
