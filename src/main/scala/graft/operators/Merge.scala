package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL MERGE INTO semantics over keyed snapshots: one statement-shaped
  * operator covering conditional matched-delete, matched-update
  * assignments, and not-matched-insert — the batch upsert a warehouse
  * MERGE runs, over plain parquet snapshots. The op-log twin
  * (`streaming/CdcApply.applyBatch`) consumes ordered change feeds;
  * this one consumes an arbitrary source frame with caller-written
  * clauses, like the SQL statement.
  *
  * Clauses are Columns over the two row images, written with the
  * `Merge.t("col")` / `Merge.s("col")` helpers (target/source field
  * access — the images ride as structs, so no name collision with user
  * columns is possible).
  *
  * Semantics (ANSI MERGE):
  *  - match condition is key equality (NULL keys never match: a
  *    NULL-key source row inserts, a NULL-key target row persists)
  *  - matched + delete condition → row dropped
  *  - matched otherwise → target row with `updateSet` assignments
  *    (unassigned columns keep the target value); no update clause
  *    means the target row persists unchanged
  *  - source-only → inserted (source must carry the target schema)
  *  - target-only + bySource delete condition → row dropped (the
  *    snapshot-sync idiom: drop target rows the source no longer
  *    carries)
  *  - target-only otherwise → target row with the bySource `updateSet`
  *    assignments (e.g. tombstone/flag columns); unassigned columns
  *    keep the target value; no bySource clause means the row persists
  *    unchanged. Note `s(...)` fields are NULL in both bySource
  *    clauses — there is no source row to read.
  *
  * Contract: source must be unique per key (ANSI MERGE raises on
  * multi-match; pre-resolve with CdcApply.latestByKey). Spec'd, not
  * runtime-checked — the check would cost an extra aggregation per run.
  *
  * Shape at scale: ONE full-outer equi-join on the key — both sides
  * hash-shuffle once; every clause is a scan-side projection over the
  * joined row. No window, no second pass, no driver state.
  */
object Merge {

  private val T = "__merge_t"
  private val S = "__merge_s"

  /** Target row image field (use inside clause Columns). */
  def t(c: String): Column = col(T).getField(c)

  /** Source row image field (use inside clause Columns). */
  def s(c: String): Column = col(S).getField(c)

  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            whenMatchedDelete: Option[Column] = None,
            whenMatchedUpdateSet: Map[String, Column] = Map.empty,
            whenNotMatchedInsert: Boolean = true,
            whenNotMatchedBySourceDelete: Option[Column] = None,
            whenNotMatchedBySourceUpdateSet: Map[String, Column] = Map.empty): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val outCols = target.columns.toSeq
    require(source.columns.toSeq == outCols,
      s"source schema ${source.columns.toSeq} must match target schema $outCols")
    (whenMatchedUpdateSet.keys ++ whenNotMatchedBySourceUpdateSet.keys).foreach(c =>
      require(outCols.contains(c), s"update assignment targets unknown column $c"))
    require(keys.forall(outCols.contains), s"keys $keys must be target columns")

    val tDf = target.select(struct(outCols.map(col): _*).as(T))
    val sDf = source.select(struct(outCols.map(col): _*).as(S))
    val cond = keys.map(k => t(k) === s(k)).reduce(_ && _)
    val joined = tDf.join(sDf, cond, "full_outer")

    val matched = col(T).isNotNull && col(S).isNotNull
    val targetOnly = col(T).isNotNull && col(S).isNull
    val deleteHit = matched && coalesce(whenMatchedDelete.getOrElse(lit(false)), lit(false))
    val bySourceDeleteHit = targetOnly &&
      coalesce(whenNotMatchedBySourceDelete.getOrElse(lit(false)), lit(false))
    val kept = joined.filter(!deleteHit && !bySourceDeleteHit &&
      (col(T).isNotNull || lit(whenNotMatchedInsert)))

    val out = outCols.map { c =>
      when(matched, whenMatchedUpdateSet.getOrElse(c, t(c)))
        .when(targetOnly, whenNotMatchedBySourceUpdateSet.getOrElse(c, t(c)))
        .otherwise(s(c))
        .as(c)
    }
    kept.select(out: _*)
  }
}
