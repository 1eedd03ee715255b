package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval-overlap join: two tables of [lo, hi) intervals,
  * matched when they overlap (and agree on optional equi-keys).
  * Complements [[RangeJoin.pointsInIntervals]] (points × intervals) —
  * the reference has neither (SURVEY.md §2.5 "not present:
  * range/interval joins"), and stock Spark plans a raw
  * `lLo < rHi && rLo < lHi` condition as BroadcastNestedLoopJoin or a
  * cartesian product — O(|L|·|R|) compare volume that cannot survive
  * 100 TB.
  *
  * Implementation: pick a band width w; each interval registers in
  * every band it touches (`floor(lo/w) .. floor(hi/w)` via
  * `sequence` + `explode`), and the overlap test runs only on pairs
  * whose bands collide — an equi-join on (keys…, band), hashable and
  * shuffle-partitionable. A pair that overlaps meets in EVERY band
  * both touch, so band collision alone would duplicate it; we keep
  * exactly the canonical band `floor(greatest(lLo, rLo) / w)` — the
  * band containing the overlap's start, which both sides necessarily
  * registered (greatest(lo) lies inside both intervals). One surviving
  * row per matching pair, no `distinct()` pass.
  *
  * Shuffle volume: Σ(span/w + 1) rows per side on a hashable key.
  * Pick w near the median interval span: smaller w replicates
  * intervals more, larger w widens the per-band compare set. Long
  * intervals cost span/w replicas — for open-ended validity intervals
  * clamp `hi` to the query horizon first (as [[Scd2]] does).
  *
  * Emits `overlap_lo` / `overlap_hi` (the intersection) alongside both
  * sides' columns. Intervals are half-open: touching intervals
  * ([1,2) vs [2,3)) do NOT match; NULL endpoints never match; and
  * DEGENERATE intervals (lo >= hi — the empty set) are dropped
  * scan-side on both sides, because the standard overlap predicate
  * `lLo < rHi && rLo < lHi` is only the set-intersection test for
  * non-empty intervals (it would claim [5,5) meets [4,6)).
  */
object IntervalJoin {

  /** @param keys equi-key pairs (leftCol, rightCol) ANDed into the
    *             join condition — they ride the shuffle key alongside
    *             the band, so per-key workloads never collide bands
    *             across keys.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lLo: String, lHi: String, rLo: String, rHi: String,
                  bandWidth: Double,
                  keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val reserved = Seq("__lband", "__rband", "overlap_lo", "overlap_hi")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"columns $reserved are reserved by the banded interval join")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left and right share columns $shared — alias one side first " +
        "(the join output would carry ambiguous duplicates)")
    val w = lit(bandWidth)
    def bands(lo: String, hi: String): Column =
      explode(sequence(floor(col(lo) / w).cast("long"), floor(col(hi) / w).cast("long")))
    val l = left.filter(col(lLo) < col(lHi)).withColumn("__lband", bands(lLo, lHi))
    val r = right.filter(col(rLo) < col(rHi)).withColumn("__rband", bands(rLo, rHi))
    val cond = keys.foldLeft(col("__lband") === col("__rband")) {
      case (acc, (a, b)) => acc && col(a) === col(b)
    }
    l.join(r, cond, "inner")
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(col("__lband") === floor(greatest(col(lLo), col(rLo)) / w).cast("long"))
      .withColumn("overlap_lo", greatest(col(lLo), col(rLo)))
      .withColumn("overlap_hi", least(col(lHi), col(rHi)))
      .drop("__lband", "__rband")
  }

  /** Probe both sides' span distribution and pick the band width:
    * `median span × slack`. Rationale: at w ≈ median, a typical
    * interval registers in ~2 bands (replication stays O(N)), while
    * smaller w multiplies replicas and larger w widens the per-band
    * compare set; the measured sf0.1 sweep (docs/BENCH_LOCAL.md:
    * 16d 3.89 s / 32d 3.06 s / 64d 3.11 s on median span ≈ 26d)
    * puts the optimum at median-plus-slack, which `slack = 1.25`
    * reproduces. The probe is ONE two-column aggregate per call
    * (approx median + max), the same measure-then-route cost as
    * `hammingTopKAuto`. Returns (width, max span); width 1.0 when no
    * non-degenerate interval exists (the join is then empty anyway).
    */
  def pickBandWidth(left: DataFrame, right: DataFrame,
                    lLo: String, lHi: String, rLo: String, rHi: String,
                    slack: Double = 1.25): (Double, Double) = {
    require(slack > 0, "slack must be positive")
    val spans = left
      .select((col(lHi) - col(lLo)).cast("double").as("__s"))
      .unionByName(right.select((col(rHi) - col(rLo)).cast("double").as("__s")))
      .filter(col("__s") > 0)
    val row = spans.agg(
      percentile_approx(col("__s"), lit(0.5), lit(10000)).as("med"),
      max(col("__s")).as("mx")).head()
    if (row.isNullAt(0)) (1.0, 0.0)
    else (math.max(row.getDouble(0) * slack, java.lang.Double.MIN_NORMAL),
      row.getDouble(1))
  }

  /** [[overlapJoin]] with the band width picked by [[pickBandWidth]],
    * and the long-interval risk ENFORCED instead of documented: if the
    * longest span would replicate into more than `maxBandsPerInterval`
    * bands at the picked width (the open-ended-validity failure mode —
    * one `hi = +∞` row exploding into millions of band replicas), the
    * call aborts with the clamp advice before any shuffle happens.
    * Clamp open-ended intervals to the query horizon first
    * (`least(hi, horizon)`, as [[Scd2]] does) or pass an explicit
    * width to [[overlapJoin]].
    */
  def overlapJoinAuto(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      keys: Seq[(String, String)] = Nil,
                      slack: Double = 1.25,
                      maxBandsPerInterval: Long = 4096): DataFrame = {
    val (w, maxSpan) = pickBandWidth(left, right, lLo, lHi, rLo, rHi, slack)
    val worst = math.ceil(maxSpan / w).toLong + 1
    require(worst <= maxBandsPerInterval,
      s"longest interval (span $maxSpan) would replicate into $worst bands at " +
        s"the picked width $w (> $maxBandsPerInterval): clamp open-ended " +
        "intervals to the query horizon (least(hi, horizon)) before the " +
        "join, or pass an explicit bandWidth to overlapJoin")
    overlapJoin(left, right, lLo, lHi, rLo, rHi, w, keys)
  }
}
