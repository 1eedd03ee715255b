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
    val aggs = columns.flatMap { c =>
      val cc = col("`" + c.replace("`", "``") + "`")
      Seq(
        F.count(F.lit(1)).as(s"__rows_$c"),
        F.sum(F.when(cc.isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (approxDistinct) approx_count_distinct(cc) else countDistinct(cc)).as(s"__distinct_$c"),
        F.min(cc).cast("string").as(s"__min_$c"),
        F.max(cc).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perColumn = columns.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    wide.select(explode(array(perColumn: _*)).as("p")).select("p.*")
  }
}
