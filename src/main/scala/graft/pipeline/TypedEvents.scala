package graft.pipeline

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` surface over the events table: case-class rows,
  * lambda transforms, and a custom `Aggregator[IN, BUF, OUT]` — the
  * type-safe tier of the engine next to the DataFrame operators
  * (SURVEY.md §1.3: "use Dataset[T] where type safety helps").
  *
  * Exactness discipline carries over from the column world: the
  * aggregator buffers an exact `java.math.BigDecimal` (same HALF_UP
  * scale-2 rounding as a Spark `cast(value AS DECIMAL(18,2))`), so the
  * merge is associative-exact under any partial-aggregation order and
  * the final double equals the SQL form bit-for-bit.
  */
object TypedEvents {

  final case class Event(event_id: Long, ts: LocalDateTime, user_id: Long,
                         event_type: String, value: Double, props: String)

  final case class UserStats(n_events: Long, sum_value: Double)

  final case class Buf(n: Long, sum: JBigDecimal)

  /** Per-user event summary as a typed Aggregator: count + exact decimal
    * sum of `value`. Spark plans it as a regular two-phase aggregate
    * (partial on the map side, merge after the key shuffle).
    */
  object UserSummary extends Aggregator[Event, Buf, UserStats] {
    private def dec(v: Double): JBigDecimal =
      // java BigDecimal.valueOf == BigDecimal(Double.toString(v)) ==
      // Spark's Decimal(double); HALF_UP matches Cast-to-decimal
      JBigDecimal.valueOf(v).setScale(2, RoundingMode.HALF_UP)
    override def zero: Buf = Buf(0L, JBigDecimal.ZERO)
    override def reduce(b: Buf, e: Event): Buf = Buf(b.n + 1, b.sum.add(dec(e.value)))
    override def merge(a: Buf, b: Buf): Buf = Buf(a.n + b.n, a.sum.add(b.sum))
    override def finish(b: Buf): UserStats = UserStats(b.n, b.sum.doubleValue)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[UserStats] = Encoders.product[UserStats]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "events").as[Event]
  }

  /** Typed pipeline: filter lambda → groupByKey → custom Aggregator →
    * flat typed result. One shuffle on the key.
    */
  def userSummaries(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .groupByKey(_.user_id)
      .agg(UserSummary.toColumn.name("s"))
      .map { case (uid, s) => (uid, s.n_events, s.sum_value) }
      .toDF("user_id", "n_events", "sum_value")
  }
}
