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
}
