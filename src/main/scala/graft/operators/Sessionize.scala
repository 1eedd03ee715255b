package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong
  * to one session while the inter-event gap stays within `gap`; a larger
  * gap starts a new session. The classic clickstream/session-window
  * operator (batch analog of Structured Streaming's session windows).
  *
  * One window shuffle on the key: `lag` marks session starts, a running
  * sum numbers them. Interval arithmetic (`ts - lag(ts) > INTERVAL gap`)
  * keeps the comparison exact and engine-neutral (no float seconds).
  */
object Sessionize {

  /** Adds `session_seq` (1-based session index per key). `tieBreak`
    * disambiguates equal timestamps (pass a unique column for
    * deterministic output).
    *
    * NULL semantics (pinned by SessionizeSpec): NULL keys form one
    * window partition (SQL window-partition grouping); NULL timestamps
    * sort first within a key and each opens its own session — the gap
    * to a NULL timestamp is unknowable, so it conservatively never
    * extends a session.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String, gap: String,
                 tieBreak: Seq[Column] = Nil): DataFrame = {
    require(!df.columns.contains("session_seq"),
      "session_seq is the sessionize output column — rename the input's first")
    val order = col(tsCol).asc +: tieBreak.map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      col(tsCol) - prev > expr(s"INTERVAL $gap"), 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row PER SESSION — the unit session analysis actually works
    * on: `keys..., session_seq, session_start, session_end,
    * duration_ms (exact integer millis), n_events`. One aggregation
    * flowing from the single sessionize window shuffle (same key
    * partitioning, no second exchange).
    */
  def sessions(df: DataFrame, keys: Seq[String], tsCol: String, gap: String,
               tieBreak: Seq[Column] = Nil): DataFrame = {
    Seq("session_start", "session_end", "duration_ms", "n_events").foreach(c =>
      require(!df.columns.contains(c), s"$c is a sessions output column — rename the input's first"))
    // NTZ timestamps cast through TIMESTAMP for integer millis — the
    // session runs UTC, so the cast is instant-preserving on both
    // endpoints of the subtraction (same recipe as the lag/lead query)
    sessionize(df, keys, tsCol, gap, tieBreak)
      .groupBy((keys :+ "session_seq").map(col): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_millis(max(col(tsCol)).cast("timestamp")) -
          unix_millis(min(col(tsCol)).cast("timestamp"))).as("duration_ms"),
        count(lit(1)).as("n_events"))
  }

  /** Per-key session summary: number of sessions and the largest session
    * (event count). Two aggregations, both flowing from the single
    * sessionize window shuffle.
    */
  def sessionSummary(df: DataFrame, keys: Seq[String], tsCol: String, gap: String,
                     tieBreak: Seq[Column] = Nil): DataFrame = {
    require(!keys.contains("__n"),
      "__n is reserved by sessionSummary's intermediate aggregation")
    val s = sessionize(df, keys, tsCol, gap, tieBreak)
    s.groupBy((keys :+ "session_seq").map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(max(col("session_seq")).cast("long").as("n_sessions"),
        max(col("__n")).as("longest_session"))
  }
}
