package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training corpora.
  *
  * `df.sample()` / `sampleBy()` are partition-layout dependent (the
  * Bernoulli draw consumes a per-partition RNG stream), so a rerun,
  * a retry, or a different file split changes the sample — unacceptable
  * for reproducible corpus cuts. Here membership is a pure function of
  * the row's key: bucket = first 15 md5 hex chars of the key mod
  * `buckets`. Same row → same bucket on any engine, any partitioning,
  * any retry; disjoint rates compose (train/val/test) because buckets
  * partition the key space.
  *
  * md5 (not xxhash64) keeps the function portable across engines — the
  * same discipline as the gate's portable simhash/fingerprint.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the key column. NULL keys map
    * to the empty string's bucket, so `deterministicSample` and `split`
    * treat them identically (dropping them in one and labelling them in
    * the other would break rate composition).
    */
  def bucketOf(key: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    // 15 hex chars = 60 bits, fits a positive long exactly
    pmod(conv(substring(md5(coalesce(key.cast("string"), lit(""))), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))
  }

  /** Keep rows whose bucket falls in [0, rateNum) of `rateDenom`
    * buckets — a deterministic `rateNum/rateDenom` sample.
    */
  def deterministicSample(df: DataFrame, keyCol: String, rateNum: Int, rateDenom: Int): DataFrame = {
    require(rateNum >= 0 && rateNum <= rateDenom, "need 0 <= rateNum <= rateDenom")
    df.filter(bucketOf(col(keyCol), rateDenom) < rateNum)
  }

  /** Stratified deterministic sampling: per-stratum keep rates over the
    * same bucket space (e.g. downsample a dominant language while keeping
    * the rest — the standard corpus-rebalancing move). `rates` maps a
    * stratum value to its numerator over `denom` buckets; unlisted strata
    * use `defaultNum`. Membership stays a pure function of the key, so
    * rebalanced cuts are reproducible and compose with [[split]].
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Int], defaultNum: Int,
                       denom: Int): DataFrame = {
    require((defaultNum +: rates.values.toSeq).forall(n => n >= 0 && n <= denom),
      "need 0 <= rate numerator <= denom for every stratum")
    val b = bucketOf(col(keyCol), denom)
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultNum)) {
      case ((value, num), acc) => when(col(strataCol) === value, lit(num)).otherwise(acc)
    }
    df.filter(b < rate)
  }

  /** Label every row with a named split; fractions are (name, numerator)
    * over `denom` buckets and must sum to at most denom (rows beyond the
    * last range get the final split). Splits are disjoint and exhaustive
    * by construction.
    */
  def split(df: DataFrame, keyCol: String, fractions: Seq[(String, Int)], denom: Int): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= denom,
      "fractions must fit in denom buckets")
    val b = bucketOf(col(keyCol), denom)
    val bounds = fractions.scanLeft(0) { case (acc, (_, n)) => acc + n }.tail
    val labeled = fractions.zip(bounds).foldRight(lit(fractions.last._1)) {
      case (((name, _), bound), acc) => when(b < bound, lit(name)).otherwise(acc)
    }
    df.withColumn("split", labeled)
  }
}
