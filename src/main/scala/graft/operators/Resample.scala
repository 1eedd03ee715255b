package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with forward fill (LOCF — last
  * observation carried forward): each key gets one row per
  * `bucketSeconds`-wide bucket between its first and last observation,
  * carrying the latest observed value at-or-before that bucket. The
  * classic gap-fill step before joining irregular event streams to a
  * regular clock (metrics rollups, feature snapshots).
  *
  * Shape at scale: the grid is GENERATED, not joined from a calendar
  * table — a |keys|-row span aggregate feeds a scan-side
  * `sequence()` explode, so grid cost is (active span ÷ bucket) rows
  * per key and nothing global. Per-bucket last-observation pick and
  * the forward-fill are one window each, both partitioned by the key —
  * two key shuffles total, with only (key, bucket, value) ever on the
  * wire. A key's cost is bounded by its own span; idle keys between
  * observations cost grid rows but no observation state.
  */
object Resample {

  /** Resample + forward-fill one value column.
    *
    * Bucket index = floor(epoch seconds ÷ bucketSeconds) — integer
    * calendar math, engine-portable. Output: key, `bucket_ts` (bucket
    * start), `value_locf` (NULL until the key's first observation in
    * range — by construction only when the first bucket has no
    * observation, which cannot happen here since the grid starts at
    * the first observation's bucket).
    *
    * @param tieBreak deterministic pick among equal timestamps in one
    *   bucket (pass a unique column); the LAST observation by
    *   (ts, tieBreak) wins, matching LOCF's "latest state" reading.
    * @param maxBucketsPerKey hard per-key grid bound. `sequence()`
    *   materializes a key's whole grid as ONE array row before the
    *   explode, so a key spanning years at a small `bucketSeconds` would
    *   otherwise fail deep inside codegen (or OOM an executor) with no
    *   hint of which key or why. Keys over the bound fail fast with a
    *   named error instead — raise `bucketSeconds` or resample such keys
    *   in time slices. The default (4M buckets ≈ 32 MB of longs ≈ 15
    *   months of 10-second buckets) keeps the array well inside both
    *   Spark's max array length and a sane executor-memory share.
    */
  def resampleLocf(events: DataFrame, key: String, tsCol: String, valueCol: String,
                   bucketSeconds: Long, tieBreak: Seq[Column] = Nil,
                   maxBucketsPerKey: Long = 4L * 1000 * 1000): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    require(maxBucketsPerKey >= 1, s"maxBucketsPerKey must be >= 1, got $maxBucketsPerKey")
    Seq("bucket_ts", "value_locf").foreach(c =>
      require(!events.columns.contains(c), s"$c is a resample output column — rename the input's first"))
    Seq("__b", "__rn", "__lo", "__hi").foreach(c =>
      require(!events.columns.contains(c), s"$c is reserved by resampleLocf"))

    // floor(epoch-micros / bucket-micros). The inner cast("timestamp")
    // accepts TIMESTAMP_NTZ inputs (reinterpreted on the UTC session
    // clock, the repo convention); epoch micros stay < 2^53 for any
    // realistic date, so the double division floors exactly.
    val bucket = floor(unix_micros(col(tsCol).cast("timestamp")).cast("double")
      / (bucketSeconds.toDouble * 1000000.0)).cast("long")

    // last observation per (key, bucket)
    val withB = events.withColumn("__b", bucket)
    val pick = Window.partitionBy(col(key), col("__b"))
      .orderBy(col(tsCol).desc +: tieBreak.map(_.desc): _*)
    val latest = withB.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col(key), col("__b"), col(valueCol).as("__v"))

    // the guard folds into __hi (a column the explode consumes) so column
    // pruning can never drop the check before it runs
    val guardedHi = when(col("__hi") - col("__lo") >= maxBucketsPerKey,
      raise_error(concat(
        lit("resampleLocf: key "), col(key).cast("string"),
        lit(" spans "), (col("__hi") - col("__lo") + 1).cast("string"),
        lit(s" buckets > maxBucketsPerKey=$maxBucketsPerKey — raise bucketSeconds, "),
        lit("raise maxBucketsPerKey, or resample this key in time slices")))
        .cast("long"))
      .otherwise(col("__hi"))
    val grid = events.groupBy(col(key))
      .agg(min(bucket).as("__lo"), max(bucket).as("__hi"))
      .select(col(key), explode(sequence(col("__lo"), guardedHi)).as("__b"))

    val fill = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(latest, Seq(key, "__b"), "left")
      .select(col(key),
        // NTZ output matches the NTZ input convention (UTC wall clock)
        timestamp_seconds(col("__b") * bucketSeconds).cast("timestamp_ntz").as("bucket_ts"),
        last(col("__v"), ignoreNulls = true).over(fill).as("value_locf"))
  }
}
