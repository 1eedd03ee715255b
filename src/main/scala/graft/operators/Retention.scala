package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event log: users are grouped into cohorts
  * by the calendar bucket of their FIRST event, and the matrix counts
  * how many of each cohort are still active in each later bucket — the
  * standard weekly/daily retention triangle.
  *
  * All time math is integer (epoch days, floor-divided into buckets),
  * so the matrix is bit-identical across engines — no date_trunc
  * locale/ISO divergence enters the result.
  *
  * Shape at scale: one aggregation of the log to a |keys|-row
  * first-event frame, one join back on the key (the |keys|-row side is
  * broadcastable; at web scale Catalyst shuffles both sides on the
  * key, which is right), then one (cohort, offset) aggregation whose
  * output is |cohorts| × |offsets| rows — tiny. The log itself never
  * shuffles more than once.
  */
object Retention {

  /** Retention matrix: (cohort_bucket, bucket_offset, n_active,
    * cohort_size). `cohort_bucket` is the integer index of the
    * `bucketDays`-day calendar bucket (epoch-day ÷ bucketDays) holding
    * the key's first event; `bucket_offset` is how many whole calendar
    * buckets later the activity falls (0 = the cohort's own bucket).
    * `n_active` counts distinct keys of the cohort active at that
    * offset; `cohort_size` is the cohort's total key count, repeated
    * per row so each row is a self-contained retention fraction.
    */
  def cohortRetention(events: DataFrame, key: String, tsCol: String,
                      bucketDays: Int = 7): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    Seq("__graft_bucket", "__graft_cohort").foreach(c =>
      require(!events.columns.contains(c), s"$c is reserved by cohortRetention"))
    // integer calendar bucket of a timestamp: epoch days, floor-divided.
    // datediff is non-negative for any post-1970 log; floor() keeps the
    // pre-1970 edge correct too (floor division, not truncation).
    val bucket = floor(datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
      .cast("double") / bucketDays).cast("long")

    val firsts = events.groupBy(col(key))
      .agg(min(bucket).as("__graft_cohort"))
    val sizes = firsts.groupBy(col("__graft_cohort").as("cohort_bucket"))
      .agg(count(lit(1)).as("cohort_size"))
    events.select(col(key), bucket.as("__graft_bucket"))
      .join(firsts, Seq(key))
      .groupBy(col("__graft_cohort").as("cohort_bucket"),
        (col("__graft_bucket") - col("__graft_cohort")).as("bucket_offset"))
      .agg(countDistinct(col(key)).as("n_active"))
      .join(sizes, Seq("cohort_bucket"))
      .select(col("cohort_bucket"), col("bucket_offset"), col("n_active"),
        col("cohort_size"))
  }
}
