package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle a table ONCE at write time so
  * every subsequent equi-join / aggregation on the bucket key runs with
  * no exchange at all.
  *
  * This is the 100 TB answer to "the same two tables join every day":
  * a shuffle of both sides per run becomes a one-time layout cost.
  * Requirements Spark imposes (and this helper encodes): both sides
  * bucketed by the join key with compatible bucket counts, read through
  * the session catalog (bucketing metadata does not survive a plain
  * `spark.read.parquet`).
  */
object Bucketing {

  /** Write as a bucketed, in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key. With matching
    * bucket specs, the physical plan contains no ShuffleExchange on
    * either side (verified by spec).
    */
  def colocatedJoin(spark: SparkSession, tableA: String, tableB: String,
                    key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)

  /** True if the physical plan for `df` contains a shuffle exchange —
    * the thing bucketing exists to eliminate. Under AQE the root is an
    * AdaptiveSparkPlanExec LEAF whose real plan hangs off `inputPlan`,
    * so a plain tree scan reports false for every query; recurse through
    * the adaptive wrapper (and any materialized query stages) explicitly.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def scan(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeLike  => true
      case a: AdaptiveSparkPlanExec => scan(a.inputPlan)
      case q: QueryStageExec        => scan(q.plan)
      case other                    => other.children.exists(scan)
    }
    scan(df.queryExecution.executedPlan)
  }
}
