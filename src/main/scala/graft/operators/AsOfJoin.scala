package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload of
  * the most recent right row with the same key and `right.ts <= left.ts`
  * (the standard market-data / feature-store lookup; absent from the
  * reference, which only has equi-joins — SURVEY.md §2.5 "not present:
  * range/as-of joins").
  *
  * Implementation is the union+window form, NOT a range join: tag both
  * sides, union them, sort each key's timeline once, and carry the last
  * seen right payload forward with `last(_, ignoreNulls)` over a running
  * row frame. Cost is ONE shuffle on the key (the window sort) with no
  * pair expansion — a range-condition join would either cross-join within
  * key groups (O(|L|·|R|) per key) or need interval bucketing. At 100 TB
  * the timeline sort is the plan you want; Catalyst cannot derive it from
  * a `l.ts >= r.ts` join condition.
  *
  * Contract: `right` must be unique per (keys, tsCol) — pre-resolve
  * duplicates with CdcApply.latestByKey (same last-writer-wins shape).
  * At equal timestamps the right row is visible to the left row (<=, not
  * <): right rows order before left rows within a timestamp.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           rightPayload: Seq[String]): DataFrame = {
    // the whole payload rides in ONE struct: a right row's struct is
    // non-null even when every payload field inside it is null, so
    // last(_, ignoreNulls) skips only left-row placeholders — a right
    // row with a genuinely-NULL payload value still supersedes older
    // rows (carrying payload columns individually would skip it and
    // resurrect a stale value)
    val payloadStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(nullable = true)))
    val leftTagged = left.select(
      left.columns.map(col) :+
        lit(null).cast(payloadStructType).as("__r") :+
        lit(1).as("__side"): _*)
    val leftOnlyCols = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val rightTagged = right.select(
      (keys :+ tsCol).map(col) ++
        leftOnlyCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__r") :+
        lit(0).as("__side"): _*)
    val unioned = leftTagged.unionByName(rightTagged)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__latest", last(col("__r"), ignoreNulls = true).over(w))
    rightPayload.foldLeft(carried) { (df, c) =>
        df.withColumn(s"asof_$c", col("__latest").getField(c))
      }
      .filter(col("__side") === 1)
      .drop("__side", "__r", "__latest")
  }
}
