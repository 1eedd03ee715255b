package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ idea,
  * re-expressed as plain aggregates): a pipeline declares what must
  * hold on a table — nullability, key uniqueness, value bounds,
  * accepted domains, referential integrity, expected cardinality —
  * and gets back ONE small report frame
  * `(constraint, metric, value, passed)` to gate a publish on.
  * Extends the reference's validator (which compares two copies of
  * the same data; `Diff`/`HashRefinement` here) to single-table
  * invariants a training-data pipeline checks before a snapshot is
  * promoted.
  *
  * Cost model at 100 TB:
  *  - ALL scalar constraints (NotNull, Bounds, InSet, NonNegative,
  *    RowCountBetween) evaluate in ONE aggregation pass over the
  *    table — each contributes a `sum(when(violated, 1))` expression
  *    to the same `agg(...)`, so adding a constraint adds zero scans.
  *  - Unique(cols) needs one hash aggregation on the key columns
  *    (count per key, then count of keys seen more than once — the
  *    second aggregate runs over |distinct keys| rows, map-side
  *    combined).
  *  - ForeignKey needs one left-anti join against the referenced
  *    key set (distinct'd first — the usual dimension-key case
  *    broadcasts).
  * The per-constraint results are 1-row frames unioned at the end —
  * driver-sized, never a data-sized shuffle.
  *
  * `value` is the violation count (BIGINT) so reports are exact and
  * hash-comparable; `passed` = (value within the constraint's bound).
  */
object Constraints {

  sealed trait Constraint { def name: String }

  /** No NULLs in `column` (violations = null count). */
  final case class NotNull(column: String) extends Constraint {
    def name = s"not_null($column)"
  }
  /** `columns` form a unique key (violations = rows carrying a duplicated key,
    * counting every row in each duplicated group).
    */
  final case class Unique(columns: Seq[String]) extends Constraint {
    def name = s"unique(${columns.mkString(",")})"
  }
  /** lo <= column <= hi on non-null values (violations = out-of-range rows). */
  final case class Bounds(column: String, lo: Column, hi: Column) extends Constraint {
    def name = s"bounds($column)"
  }
  /** Non-null values drawn from `values` (violations = rows outside the set). */
  final case class InSet(column: String, values: Seq[String]) extends Constraint {
    def name = s"in_set($column)"
  }
  /** Every non-null `column` value exists in `refColumn` of `ref`
    * (violations = orphan rows).
    */
  final case class ForeignKey(column: String, ref: DataFrame, refColumn: String)
      extends Constraint {
    def name = s"foreign_key($column)"
  }
  /** minRows <= count(*) <= maxRows (violations = 0/1: whether the bound failed;
    * `value` reports the distance outside the bound).
    */
  final case class RowCountBetween(minRows: Long, maxRows: Long) extends Constraint {
    def name = "row_count"
  }

  private final case class Scalar(c: Constraint, violations: Column)

  /** Evaluate `constraints` against `df`; returns
    * `(constraint STRING, value BIGINT, passed BOOLEAN)`, one row per
    * constraint, ordered by constraint name.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "duplicate constraint names — each constraint must be declared once")
    val scalars = constraints.collect {
      case c @ NotNull(col0) =>
        Scalar(c, sum(when(col(col0).isNull, 1L).otherwise(0L)))
      case c @ Bounds(col0, lo, hi) =>
        Scalar(c, sum(when(col(col0).isNotNull && !(col(col0) >= lo && col(col0) <= hi),
          1L).otherwise(0L)))
      case c @ InSet(col0, values) =>
        Scalar(c, sum(when(col(col0).isNotNull && !col(col0).isInCollection(values),
          1L).otherwise(0L)))
      case c @ RowCountBetween(_, _) => Scalar(c, count(lit(1)))
    }

    val scalarReport: Option[DataFrame] =
      if (scalars.isEmpty) None
      else {
        val aggs = scalars.zipWithIndex.map { case (s, i) => s.violations.as(s"m$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = scalars.zipWithIndex.map { case (s, i) =>
          val m = coalesce(col(s"m$i"), lit(0L)).cast("long")
          val (value: Column, passed: Column) = s.c match {
            case RowCountBetween(lo, hi) =>
              val dist = when(m < lo, lit(lo) - m).when(m > hi, m - lit(hi)).otherwise(lit(0L))
              (dist, m >= lo && m <= hi)
            case _ => (m, m === 0L)
          }
          struct(lit(s.c.name).as("constraint"), value.cast("long").as("value"),
            passed.as("passed"))
        }
        Some(one.select(explode(array(rows: _*)).as("r")).select("r.*"))
      }

    val grouped: Seq[DataFrame] = constraints.collect {
      case c @ Unique(cols0) =>
        df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(when(col("__n") > 1, col("__n")).otherwise(0L)), lit(0L))
            .cast("long").as("value"))
          .select(lit(c.name).as("constraint"), col("value"), (col("value") === 0L).as("passed"))
      case c @ ForeignKey(col0, ref, refCol) =>
        df.filter(col(col0).isNotNull)
          .join(ref.select(col(refCol).as(col0)).distinct(), Seq(col0), "left_anti")
          .agg(count(lit(1)).cast("long").as("value"))
          .select(lit(c.name).as("constraint"), col("value"), (col("value") === 0L).as("passed"))
    }

    val parts = scalarReport.toSeq ++ grouped
    parts.reduce(_.unionByName(_)).orderBy("constraint")
  }
}
