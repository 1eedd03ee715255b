package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event log: for each key, step 1
  * is reached at the earliest event of the first step type; step i is
  * reached at the earliest event of type i at-or-after step i-1's reach
  * time. The classic product-analytics "view → click → purchase"
  * conversion question, asked per key.
  *
  * Shape at scale: NO per-key event collection and no window over the
  * raw log. Each step is one filtered aggregation of the log down to a
  * |keys|-row frame (min reach time), chained by an equi-join on the
  * key; the log is scanned once per step with the step-type filter
  * pushed to the scan, and every join is keyed on the funnel key (a
  * |keys|-row build side Catalyst is free to broadcast). k steps cost k
  * pushdown scans + k key aggregations — nothing proportional to the
  * per-key event count is ever held in memory.
  */
object Funnel {

  /** Per-key reach times: columns `step_1_ts … step_k_ts` (NULL once
    * the funnel is abandoned) plus `steps_reached`. Keys that never
    * reach step 1 are absent (no funnel entry — matching the SQL
    * formulation where step 1's aggregate defines the population).
    *
    * Reach-time rule is at-or-after (`>=`): a step event carrying the
    * SAME timestamp as the previous step's reach counts, so
    * zero-latency pipelines (batch-stamped logs) still convert.
    */
  def reachTimes(events: DataFrame, key: String, tsCol: String, typeCol: String,
                 steps: Seq[String]): DataFrame =
    reachTimes(events, key, tsCol, typeCol, steps, None)

  /** Windowed form: with `within = Some("7 days")`, every later step
    * must land within that interval OF STEP 1's reach time — the
    * standard conversion-window funnel (unbounded funnels overcount:
    * a purchase a year after the view is not that view converting).
    * Same plan shape; the window bound is one extra scan-side
    * predicate on each step's pre-aggregation filter.
    */
  def reachTimes(events: DataFrame, key: String, tsCol: String, typeCol: String,
                 steps: Seq[String], within: Option[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    val stepCols = steps.indices.map(i => s"step_${i + 1}_ts")
    stepCols.foreach(c => require(!events.columns.contains(c),
      s"$c is a funnel output column — rename the input's first"))
    require(!events.columns.contains("steps_reached"),
      "steps_reached is a funnel output column — rename the input's first")

    val deadline = within.map(w => expr(s"INTERVAL $w"))
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(key)).agg(min(col(tsCol)).as(stepCols.head))
    val reach = steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prevC = stepCols(i - 1)
      val curC = stepCols(i)
      // prevC IS step_1_ts on the first hop — select distinct names
      val carry = Seq(key, stepCols.head, prevC).distinct.map(col)
      val next = events.filter(col(typeCol) === step)
        .join(acc.select(carry: _*), Seq(key))
        .filter(col(tsCol) >= col(prevC) &&
          deadline.fold(lit(true))(d => col(tsCol) <= col(stepCols.head) + d))
        .groupBy(col(key)).agg(min(col(tsCol)).as(curC))
      acc.join(next.select(col(key), col(curC)), Seq(key), "left")
    }
    val reached = stepCols.map(c => when(col(c).isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    reach.withColumn("steps_reached", reached)
  }

  /** Funnel summary: one row per step with the number of keys that
    * reached it — the conversion curve. Flows from `reachTimes`'s
    * |keys|-row frame; the per-step counts are conditional sums in ONE
    * aggregation, then a constant-sized explode to (step, n) rows.
    */
  def stepCounts(events: DataFrame, key: String, tsCol: String, typeCol: String,
                 steps: Seq[String]): DataFrame = {
    val reach = reachTimes(events, key, tsCol, typeCol, steps)
    // coalesce: a log with no step-1 keys leaves reachTimes empty and a
    // no-groupBy sum over zero rows is NULL — the conversion curve owes 0
    val countCols = steps.indices.map(i =>
      coalesce(sum(when(col(s"step_${i + 1}_ts").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as(s"n_${i + 1}"))
    val counts = reach.agg(countCols.head, countCols.tail: _*)
    val pairs = steps.indices.map(i =>
      struct(lit(i + 1).cast("long").as("step"), lit(steps(i)).as("step_type"),
        col(s"n_${i + 1}").as("n_reached")))
    counts.select(explode(array(pairs: _*)).as("s"))
      .select(col("s.step"), col("s.step_type"), col("s.n_reached"))
  }
}
