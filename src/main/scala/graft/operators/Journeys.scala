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

  /** Multi-touch attribution over converting journeys: for each key
    * that reaches `conversionType`, the touches (events of
    * `touchTypes`) at-or-before the FIRST conversion earn credit under
    * three standard models AT ONCE — first-touch, last-touch, and
    * linear. Output: one row per touch type with
    *
    *  - `first_touch`, `last_touch` — converting keys whose journey
    *    this type opened / closed,
    *  - `n_touches` — total touch events of this type across
    *    converting journeys,
    *  - `linear_ppm` — linear credit in exact parts-per-million: each
    *    touch EVENT earns floor(10⁶ / n_touches_of_its_key) ppm.
    *    Integer floor division keeps the number engine-exact (a double
    *    fraction sum is order-dependent and can never hash-match an
    *    oracle); a key's credits undershoot 10⁶ by < n_touches ppm.
    *
    * Shape at scale: one |keys|-row conversion aggregate joined back on
    * the key (broadcastable), one key window for first/last ranks, two
    * key aggregations — nothing proportional to journey length is held.
    */
  def attribution(events: DataFrame, key: String, tsCol: String,
                  typeCol: String, conversionType: String,
                  touchTypes: Seq[String], tieBreak: Seq[Column] = Nil): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(!touchTypes.contains(conversionType),
      "the conversion type cannot also be a touch type")
    Seq("__conv_ts", "__rn_a", "__rn_d", "__n_key").foreach(c =>
      require(!events.columns.contains(c), s"$c is reserved by attribution"))

    val conv = events.filter(col(typeCol) === conversionType)
      .groupBy(col(key)).agg(min(col(tsCol)).as("__conv_ts"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .join(conv, Seq(key))
      .filter(col(tsCol) <= col("__conv_ts"))
    val order = col(tsCol).asc +: tieBreak.map(_.asc)
    val w = Window.partitionBy(col(key))
    val ranked = touches
      .withColumn("__rn_a", row_number().over(w.orderBy(order: _*)))
      .withColumn("__rn_d", row_number().over(
        w.orderBy((col(tsCol).desc +: tieBreak.map(_.desc)): _*)))
      .withColumn("__n_key", count(lit(1)).over(w))
    ranked
      .groupBy(col(typeCol).as("touch_type"))
      .agg(
        sum(when(col("__rn_a") === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("__rn_d") === 1, 1L).otherwise(0L)).as("last_touch"),
        count(lit(1)).as("n_touches"),
        sum(floor(lit(1000000L) / col("__n_key"))).cast("long").as("linear_ppm"))
  }
}
