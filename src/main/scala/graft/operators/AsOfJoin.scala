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
  *
  * NULL join keys follow SQL equality-join semantics (NULL = NULL is
  * false, matching DuckDB's ASOF JOIN): right rows with a NULL key are
  * discarded, left rows with a NULL key come back unmatched (null
  * payload). Columns named `__r`/`__side`/`__latest` or `asof_<payload>`
  * are reserved and rejected.
  */
object AsOfJoin {

  /** NEAREST-within-tolerance as-of (pandas merge_asof
    * direction='nearest'): per left row, the right row minimizing
    * |right.ts − left.ts| among rows within `tolerance`, ties broken
    * BACKWARD (the past wins over an equally-distant future — the
    * leakage-conservative default). Composition of two [[asOf]]
    * passes — backward as-is, forward on negated micros — joined on a
    * caller-supplied unique `leftId`; each pass is the union+window
    * single-key-shuffle plan, so nearest costs two timeline sorts and
    * one id join, never a pair expansion.
    *
    * `tolerance` is in MICROSECONDS for timestamp columns and raw
    * units for numeric ones. Output adds `near_<payload>` columns,
    * `near_dist` (the |Δ|, same units), and `near_dir` ('b'/'f') —
    * all NULL when no right row lands within tolerance. Same right-
    * uniqueness contract as [[asOf]].
    */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  tsCol: String, rightPayload: Seq[String],
                  tolerance: Long, leftId: String): DataFrame = {
    require(tolerance >= 0, "tolerance must be >= 0")
    require(left.columns.contains(leftId), s"leftId $leftId not in left")
    val reserved = Seq("__rts", "__neg", "near_dist", "near_dir") ++
      rightPayload.map(c => s"near_$c") ++ rightPayload.map(c => s"fwd_$c")
    for (c <- left.columns if reserved.contains(c))
      throw new IllegalArgumentException(s"asOfNearest: left column $c is reserved")
    def micros(df: DataFrame): Column = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(tsCol).cast("timestamp"))
      case _ => col(tsCol).cast("long")
    }
    val r2 = right.withColumn("__rts", micros(right))
    val payload = rightPayload :+ "__rts"
    val back = asOf(left, r2, keys, tsCol, payload)
    val fwd = asOf(left.withColumn("__neg", -micros(left)),
        r2.withColumn("__neg", -micros(r2)).drop(tsCol), keys, "__neg", payload)
      .select((col(leftId) +: payload.map(c => col(s"asof_$c").as(s"fwd_$c"))): _*)
    val joined = back.join(fwd, Seq(leftId))
    val lm = micros(back)
    val db = lm - col("asof___rts")
    val dfwd = col("fwd___rts") - lm
    val pickB = col("asof___rts").isNotNull && db <= tolerance &&
      (col("fwd___rts").isNull || db <= dfwd)
    val pickF = !coalesce(pickB, lit(false)) &&
      col("fwd___rts").isNotNull && dfwd <= tolerance
    val withNear = rightPayload.foldLeft(joined) { (df, c) =>
      df.withColumn(s"near_$c",
        when(pickB, col(s"asof_$c")).when(pickF, col(s"fwd_$c")))
    }
    withNear
      .withColumn("near_dist", when(pickB, db).when(pickF, dfwd))
      .withColumn("near_dir", when(pickB, lit("b")).when(pickF, lit("f")))
      .drop(payload.map(c => s"asof_$c"): _*)
      .drop(payload.map(c => s"fwd_$c"): _*)
  }

  private def requireNoReserved(left: DataFrame, right: DataFrame,
                                rightPayload: Seq[String]): Unit = {
    val reserved = Set("__r", "__side", "__latest")
    for (df <- Seq(left, right); c <- df.columns if reserved(c))
      throw new IllegalArgumentException(
        s"as-of: column $c collides with a reserved internal name")
    val outNames = rightPayload.map(c => s"asof_$c").toSet
    for (c <- left.columns if outNames(c))
      throw new IllegalArgumentException(
        s"as-of: left column $c collides with an output payload name")
  }

  private def nonNullKeys(df: DataFrame, keys: Seq[String]): Column =
    keys.map(col(_).isNotNull).reduce(_ && _)

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           rightPayload: Seq[String]): DataFrame = {
    requireNoReserved(left, right, rightPayload)
    // SQL equality semantics for NULL keys: a NULL-key right row can match
    // nothing, so drop it BEFORE the union — NULL-key left rows then land
    // in timeline partitions with no right rows and emit unmatched. (The
    // window's partitionBy would otherwise group NULLs together and hand a
    // NULL-key left row the latest NULL-key payload.)
    val rightKeyed = right.filter(nonNullKeys(right, keys))
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
    val rightTagged = rightKeyed.select(
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

  /** Same contract and output shape as [[asOf]], executed by the native
    * whole-operator plan (`graft.plans.AsOfJoinExec`): both sides
    * hash-partition on the key, sort by (key, time), then one linear
    * merge pass per partition — no unioned timeline, no window buffer.
    * Same single-shuffle cost shape, strictly less per-partition work.
    * Self-registers the planner strategy on `df.sparkSession`.
    */
  def asOfNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                 tsCol: String, rightPayload: Seq[String]): DataFrame = {
    requireNoReserved(left, right, rightPayload)
    for (c <- left.columns if c.startsWith("__r_"))
      throw new IllegalArgumentException(
        s"as-of: left column $c collides with the right-side rename prefix")
    val spark = left.sparkSession
    graft.plans.GraftExtensions.install(spark)
    import org.apache.spark.sql.GraftColumnBridge
    // SQL NULL-key semantics, same as [[asOf]]: the node itself compares
    // keys with a natural ordering (NULL groups with NULL), so drop
    // NULL-key right rows here — NULL-key left rows then emit unmatched
    // prune + prefix the right side so the joined output has unique names
    // (the node is opaque to ColumnPruning — project BEFORE the join)
    val rPruned = right.filter(nonNullKeys(right, keys))
      .select((keys ++ Seq(tsCol) ++ rightPayload).distinct.map(col): _*)
    val rRenamed = rPruned.toDF(rPruned.columns.map(c => s"__r_$c"): _*)
    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan = GraftColumnBridge.analyzed(rRenamed)
    def attr(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute], n: String) =
      out.find(_.name == n).getOrElse(sys.error(s"as-of: no column $n"))
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      keys.map(attr(lPlan.output, _)),
      keys.map(k => attr(rPlan.output, s"__r_$k")),
      attr(lPlan.output, tsCol), attr(rPlan.output, s"__r_$tsCol"))
    GraftColumnBridge.ofRows(spark, node)
      .select(left.columns.map(col) ++
        rightPayload.map(c => col(s"__r_$c").as(s"asof_$c")): _*)
  }
}
