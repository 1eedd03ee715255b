package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join: points against intervals on
  * `lo <= point < hi` — absent from the reference (SURVEY.md §2.5 "not
  * present: range/interval joins") and a trap in stock Spark: a raw
  * range condition plans as BroadcastNestedLoopJoin (O(|P|·|I|) compare
  * volume) or falls back to a cartesian product.
  *
  * Implementation: pick a band width w; an interval [lo, hi) registers
  * in every band it overlaps (`floor(lo/w) .. floor(hi/w)` via
  * `sequence` + `explode`), a point lands in exactly one band. An
  * equi-join on the band key then only compares point–interval pairs
  * whose bands collide, and the exact predicate filters the band-edge
  * false positives. Shuffle volume: |P| + Σ(interval spans / w) rows on
  * a hashable key — the standard spatial-binning reduction from
  * quadratic compares to near-linear. No duplicates: a point has one
  * band, so each (point, interval) pair meets at most once.
  *
  * Pick w near the median interval width: smaller w = more interval
  * replication, larger w = more false-positive compares per band.
  */
object RangeJoin {

  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        pointCol: String, loCol: String, hiCol: String,
                        bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(!points.columns.contains("__band") && !intervals.columns.contains("__band"),
      "__band is reserved by the banded range join")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals share columns $overlap — alias one side first " +
        "(the join output would carry ambiguous duplicates)")
    val w = lit(bandWidth)
    val p = points.withColumn("__band", floor(col(pointCol) / w).cast("long"))
    val i = intervals.withColumn("__band",
      explode(sequence(floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    p.join(i, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__band")
  }
}
