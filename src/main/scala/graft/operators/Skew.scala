package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale.
  *
  * AQE (spark.sql.adaptive.skewJoin) handles *partition*-level skew at
  * runtime; these operators handle the harder case AQE can't split — a
  * single key too hot for one task:
  *
  *  - saltedAggregate: two-phase aggregation. Phase 1 aggregates on
  *    (key, salt) — spreading one hot key over `saltBuckets` tasks —
  *    phase 2 merges the partials. Correct for any algebraic aggregate
  *    expressed as (partial, merge) column pairs.
  *  - saltedJoin: replicate-broadcast pattern for a skewed fact side
  *    against a dimension: fact rows get a random-but-deterministic salt,
  *    the dimension is exploded `saltBuckets` times, and the join key
  *    becomes (key, salt). Use when the dimension is small enough to
  *    replicate but the fact's hot keys overwhelm single tasks.
  *
  * Salt is `pmod(hash(cols...), buckets)` over the *row's other columns*
  * so it is deterministic per row — reruns and retries produce identical
  * assignments, keeping the operators safe under task retry. Callers must
  * name at least one salt column: a positional fallback (e.g.
  * monotonically_increasing_id) is partition-layout dependent and can
  * reassign rows when a map stage is recomputed — the classic
  * nondeterministic-shuffle correctness hazard for two-phase aggregation.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from the given columns. */
  def salt(buckets: Int, over: Seq[Column]): Column = {
    require(over.nonEmpty,
      "salt requires at least one column: row-position fallbacks are not stable under task retry")
    pmod(hash(over: _*), lit(buckets))
  }

  /** One aggregate in (partial, merge) form, e.g.
    * Agg(sum(col("x")).as("s"), sum(col("s")).as("s")).
    */
  final case class Agg(partial: Column, merge: Column)

  /** sum / count / min / max helpers in two-phase form. */
  def sumOf(c: Column, as: String): Agg = Agg(sum(c).as(as), sum(col(as)).as(as))
  def countOf(as: String): Agg = Agg(count(lit(1)).as(as), sum(col(as)).as(as))
  def minOf(c: Column, as: String): Agg = Agg(min(c).as(as), min(col(as)).as(as))
  def maxOf(c: Column, as: String): Agg = Agg(max(c).as(as), max(col(as)).as(as))

  /** Two-phase salted groupBy: groupBy(key, salt).agg(partials) then
    * groupBy(key).agg(merges). The extra shuffle is the price for
    * spreading a hot key across `saltBuckets` tasks; phase-1 output is
    * |keys|·buckets rows, so phase 2 is cheap.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      saltOver: Seq[String], aggs: Seq[Agg]): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    require(!df.columns.contains("__salt"),
      "__salt is reserved by the salting operators — rename the input's first")
    val salted = df.withColumn("__salt", salt(saltBuckets, saltOver.map(col)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head.merge, aggs.tail.map(_.merge): _*)
  }

  /** Key-skew profile: per-key row counts reduced to the distribution
    * stats that drive partitioning decisions (salt bucket counts, AQE
    * skew thresholds, broadcast viability). Two-level aggregation — the
    * heavy first shuffle carries only (key, count) partials, the second
    * reduces |keys| rows to one. Run this BEFORE sizing a 100 TB join:
    * max_n vs p50 is the skew ratio that decides between a plain shuffle
    * join, salting, or AQE skew-split.
    */
  def keyProfile(df: DataFrame, keys: Seq[String]): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      max(col("n")).as("max_n"),
      sum(col("n")).as("total_rows"),
      percentile(col("n"), lit(0.5)).as("p50"),
      percentile(col("n"), lit(0.9)).as("p90"),
      percentile(col("n"), lit(0.99)).as("p99"))
  }

  /** Salted fact-dimension equi-join: fact gets salt from its own row,
    * dimension rows are replicated once per bucket, join on key+salt.
    * Output equals the plain inner join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltBuckets: Int,
                 factSaltOver: Seq[String]): DataFrame = {
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt is reserved by the salting operators — rename the input's first")
    val saltedFact = fact.withColumn("__salt", salt(saltBuckets, factSaltOver.map(col)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** [[keyProfile]]'s single row as a typed driver value. */
  final case class Profile(nKeys: Long, maxN: Long, totalRows: Long,
                           p50: Double, p90: Double, p99: Double) {
    /** Hot-key ratio: rows under the heaviest key vs the median key. */
    def skewRatio: Double = maxN / math.max(p50, 1.0)
  }

  def profile(df: DataFrame, keys: Seq[String]): Profile = {
    val r = keyProfile(df, keys).head()
    Profile(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
  }

  /** The three join shapes [[decide]] picks between, with the picked
    * parameters baked in. `reason` makes the decision auditable in logs
    * — a 100-TB plan choice should never be silent.
    */
  sealed trait JoinChoice { def reason: String }
  final case class BroadcastChoice(dimRows: Long, reason: String) extends JoinChoice
  final case class SaltedChoice(buckets: Int, reason: String) extends JoinChoice
  final case class PlainChoice(reason: String) extends JoinChoice

  /** Decision thresholds. Defaults assume ~1M rows is a comfortable
    * task's worth of join input and a dimension under `broadcastMaxRows`
    * fits every executor; tune both to the cluster's memory story.
    */
  final case class JoinPolicy(
      broadcastMaxRows: Long = 1000000L,
      skewRatioThreshold: Double = 16.0,
      minHotKeyRows: Long = 1000000L,
      targetRowsPerTask: Long = 1000000L,
      maxSaltBuckets: Int = 64,
      saltedMaxDimRows: Long = 10000000L)

  /** Pure decision function (unit-testable without a cluster):
    *
    *  1. dimension small enough -> broadcast (skew-immune: the fact
    *     side never shuffles, so hot keys cost nothing extra)
    *  2. fact skewed (hot key both RELATIVELY heavy — skewRatio — and
    *     ABSOLUTELY too big for one task) and the dimension modest
    *     enough to replicate -> salted join, buckets sized so the hot
    *     key spreads to ~targetRowsPerTask per task
    *  3. otherwise -> plain shuffle join (AQE's partition-level skew
    *     split handles the residual cases)
    */
  def decide(factProfile: Profile, dimRows: Long,
             policy: JoinPolicy = JoinPolicy()): JoinChoice =
    if (dimRows <= policy.broadcastMaxRows)
      BroadcastChoice(dimRows,
        s"dim has $dimRows rows <= broadcastMaxRows=${policy.broadcastMaxRows}")
    else if (factProfile.skewRatio >= policy.skewRatioThreshold &&
             factProfile.maxN >= policy.minHotKeyRows &&
             dimRows <= policy.saltedMaxDimRows) {
      val buckets = math.min(policy.maxSaltBuckets.toLong,
        (factProfile.maxN + policy.targetRowsPerTask - 1) / policy.targetRowsPerTask).toInt
      SaltedChoice(math.max(buckets, 2),
        f"hot key ${factProfile.maxN} rows, skewRatio=${factProfile.skewRatio}%.1f >= " +
          s"${policy.skewRatioThreshold}; dim $dimRows rows replicable")
    } else
      PlainChoice(
        f"no broadcast (dim $dimRows rows), skewRatio=${factProfile.skewRatio}%.1f " +
          s"or hot key ${factProfile.maxN} below thresholds — shuffle join + AQE")

  /** Profile -> decision -> join, closed loop. Runs TWO small driver
    * jobs first (the fact key profile and the dim count) — at the scale
    * where this matters, a counting pass is noise next to a mis-planned
    * join. Returns the decision alongside the frame so callers can log
    * it. Inner equi-join on `key`; output equals the plain join in
    * every branch (SkewSpec pins that and the chosen plans).
    */
  def autoJoin(fact: DataFrame, dim: DataFrame, key: String,
               factSaltOver: Seq[String],
               policy: JoinPolicy = JoinPolicy()): (JoinChoice, DataFrame) = {
    val choice = decide(profile(fact, Seq(key)), dim.count(), policy)
    val joined = choice match {
      case BroadcastChoice(_, _) => fact.join(broadcast(dim), key)
      case SaltedChoice(buckets, _) => saltedJoin(fact, dim, key, buckets, factSaltOver)
      case PlainChoice(_) => fact.join(dim, key)
    }
    (choice, joined)
  }
}
