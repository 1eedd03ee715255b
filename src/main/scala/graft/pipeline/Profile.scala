package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Column-level data profiling: null counts, distinct cardinality,
  * min/max — the "analyze table" pass a pipeline runs before deciding
  * partition keys, salt buckets, and quality thresholds.
  *
  * One aggregation job for ALL columns (single scan): each metric is an
  * aggregate expression, not a per-column pass. Exact distinct counts
  * shuffle per column; for 100 TB profiling use `approxDistinct = true`
  * (HyperLogLog++, no extra shuffle, ~2% error).
  */
object Profile {

  /** Long-form profile: one output row per profiled column.
    * Values are stringified so heterogeneous column types stack.
    */
  def profile(df: DataFrame, columns: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    // generated aliases are index-based, not name-based: a profiled
    // column named "a.b" would otherwise produce an alias whose later
    // col() reference parses the dot as a field access and fails
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      val cc = col("`" + c.replace("`", "``") + "`")
      Seq(
        F.count(F.lit(1)).as(s"__rows_$i"),
        F.sum(F.when(cc.isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        (if (approxDistinct) approx_count_distinct(cc) else countDistinct(cc)).as(s"__distinct_$i"),
        F.min(cc).cast("string").as(s"__min_$i"),
        F.max(cc).cast("string").as(s"__max_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perColumn = columns.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        col(s"__rows_$i").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"),
        col(s"__distinct_$i").cast("long").as("n_distinct"),
        col(s"__min_$i").as("min_value"),
        col(s"__max_$i").as("max_value"))
    }
    wide.select(explode(array(perColumn: _*)).as("p")).select("p.*")
  }
}
