package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-transition statistics (user-journey / Markov-chain analysis):
  * how often each event type follows each other type within a key's
  * timeline. The `from_type IS NULL` rows are the entry distribution
  * (each key's first event). Together with `Funnel` (fixed ordered
  * steps) and `Sessionize` (gap windows) this completes the standard
  * clickstream toolkit: the matrix answers "where do users actually
  * go", the funnel answers "do they follow the path we designed".
  *
  * Shape at scale: ONE window shuffle on the key (`lag`, the same
  * exchange Sessionize uses) followed by one (from, to) aggregation
  * whose output is |types|² + |types| rows — constant-sized; only
  * (key, type, ts) ever crosses the wire.
  */
object Journeys {

  /** Transition matrix: `from_type` (NULL = timeline entry), `to_type`,
    * `n_transitions`. `tieBreak` orders equal timestamps (pass a unique
    * column for deterministic output).
    */
  def transitionMatrix(events: DataFrame, key: String, tsCol: String,
                       typeCol: String, tieBreak: Seq[Column] = Nil): DataFrame = {
    Seq("from_type", "to_type", "n_transitions").foreach(c =>
      require(!events.columns.contains(c),
        s"$c is a transitionMatrix output column — rename the input's first"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc +: tieBreak.map(_.asc): _*)
    events
      .select(col(key), lag(col(typeCol), 1).over(w).as("from_type"),
        col(typeCol).as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }
}
