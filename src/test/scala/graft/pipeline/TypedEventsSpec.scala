package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class TypedEventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed aggregator equals the column-form decimal aggregation exactly") {
    val typed = TypedEvents.userSummaries(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sql = Tables.load(spark, TestSpark.sf, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(typed.keySet == sql.keySet)
    // bit-for-bit, not approximately: the aggregator's decimal buffer
    // reproduces cast-to-decimal semantics under any merge order
    typed.foreach { case (k, v) => assert(v == sql(k), s"user $k") }
  }

  test("typed rows round-trip the events schema (ntz timestamps included)") {
    val ds = TypedEvents.events(spark, TestSpark.sf)
    val first = ds.filter((e: TypedEvents.Event) => e.event_id == 0L).head()
    assert(first.ts != null && first.event_type.nonEmpty)
    assert(ds.count() > 0)
  }
}
