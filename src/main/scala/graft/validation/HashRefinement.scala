package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ContentHash

/** Two-stage hash-refined validation — the reference's richest dataflow
  * (scylla/MySQLToScyllaValidator.scala:701-747 hash stage,
  * :988-1097 refinement joins):
  *
  *  stage 1: replace the wide payload with one content digest per side,
  *           join on PK, keep only digest-mismatched PKs. The shuffle
  *           carries (pk, 64-char digest) instead of the full row — the
  *           reference's shuffle-volume rewrite, and the reason this
  *           scales: at 100 TB the wide payload never crosses the wire
  *           for matching rows (the overwhelming majority).
  *  stage 2: for the (few) mismatched PKs only, join the real columns
  *           back and attribute exactly which columns differ.
  *
  * Output: pk columns ++ `differing_columns` (comma-joined sorted list).
  */
object HashRefinement {

  def refine(source: DataFrame, target: DataFrame, pk: Seq[String],
             compareCols: Seq[String]): DataFrame = {
    // stage 1: digests only
    val srcHashed = source.select(pk.map(col) :+
      ContentHash.rowHash(source, compareCols).as("__src_hash"): _*)
    val tgtHashed = target.select(pk.map(col) :+
      ContentHash.rowHash(target, compareCols).as("__tgt_hash"): _*)
    // null-safe PK joins throughout, matching fullDiff: a plain equi-join
    // would drop NULL key components, so a mismatch fullDiff counts
    // could never be attributed here
    val mismatchedKeys = srcHashed.as("sh").join(tgtHashed.as("th"),
        pk.map(k => col(s"sh.$k") <=> col(s"th.$k")).reduce(_ && _))
      .filter(col("__src_hash") =!= col("__tgt_hash"))
      .select(pk.map(k => col(s"sh.$k").as(k)): _*)
      // small by design (only diverged keys); materialize once so the two
      // stage-2 semi joins and repeated caller actions don't re-run the
      // full stage-1 hash scan per use
      .transform(graft.Checkpoints.materialize)

    // stage 2: pull real columns for mismatched keys only (left_semi
    // prunes both sides before the compare join)
    def slim(df: DataFrame): DataFrame =
      df.select((pk ++ compareCols).map(col): _*).as("x")
        .join(mismatchedKeys.as("mk"),
          pk.map(k => col(s"x.$k") <=> col(s"mk.$k")).reduce(_ && _), "left_semi")
    val srcSlim = slim(source)
    val tgtSlim = slim(target)
    val joined = srcSlim.as("s").join(tgtSlim.as("t"),
      pk.map(k => col(s"s.$k") <=> col(s"t.$k")).reduce(_ && _))

    val diffs: Column = concat_ws(",",
      array_sort(array_compact(array(compareCols.map(c =>
        when(!(col(s"s.$c") <=> col(s"t.$c")), lit(c))): _*))))
    joined.select(pk.map(k => col(s"s.$k").as(k)) :+ diffs.as("differing_columns"): _*)
      .filter(col("differing_columns") =!= "")
  }
}
