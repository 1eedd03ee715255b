package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomSet

/** Bloom-pruned big-big join — a hand-rolled runtime filter for the
  * shape Spark's own `InjectRuntimeFilter` often declines (non-DPP
  * sources, pre-filtered build sides, DSv2 scans): when the build side
  * is too big to broadcast as rows but its KEY SET fits a bloom
  * filter, shuffling the full probe side is waste — at 100 TB the
  * probe shuffle dominates the job.
  *
  * `prunedJoin` builds a bloom of the build side's join keys as a
  * 1-row aggregate (scalar subquery — stays a plan node, never a
  * driver collect), prefilters the probe SCAN-SIDE with the codegen'd
  * `might_contain`, then runs the ordinary equi-join. False positives
  * only let extra rows into the shuffle where the exact join drops
  * them — results are identical to the plain join; false negatives
  * don't exist. Probe rows with NULL keys are dropped scan-side (an
  * inner join would drop them anyway — documented contract).
  *
  * Sizing: `expectedKeys` within ~2× of the build side's true
  * distinct-key count keeps the false-positive rate near the
  * (items, bits) design point; see [[BloomSet.bloomAgg]] for the
  * session caps that bound the broadcast at ~10 bits/key.
  */
object BloomJoin {

  def prunedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val shared = probe.columns.toSet.intersect(build.columns.toSet)
    require(shared.isEmpty,
      s"probe and build share columns $shared — alias one side first")
    val bits = BloomSet.suggestNumBits(expectedKeys, fpp)
    val bloom = build
      .agg(BloomSet.bloomAgg(col(buildKey), expectedKeys, bits).as("bf"))
      .scalar()
    probe
      .filter(col(probeKey).isNotNull && BloomSet.mightContain(bloom, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey), "inner")
  }
}
