package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class JourneysSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("counts consecutive transitions per key; NULL from_type marks entries") {
    val df = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00"), "view"),
      (2L, "u1", ts("2024-01-01 10:01:00"), "click"),
      (3L, "u1", ts("2024-01-01 10:02:00"), "view"),
      (4L, "u2", ts("2024-01-01 10:00:00"), "view"),
      (5L, "u2", ts("2024-01-01 10:01:00"), "click")
    ).toDF("event_id", "u", "ts", "etype")
    val got = Journeys.transitionMatrix(df, "u", "ts", "etype", Seq(col("event_id")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (null, "view", 2L),        // both keys enter at a view
      ("view", "click", 2L),
      ("click", "view", 1L)))
  }

  test("equal timestamps order by the tie-break column") {
    val df = Seq(
      (1L, "u", ts("2024-01-01 10:00:00"), "a"),
      (2L, "u", ts("2024-01-01 10:00:00"), "b")
    ).toDF("event_id", "u", "ts", "etype")
    val got = Journeys.transitionMatrix(df, "u", "ts", "etype", Seq(col("event_id")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set((null, "a"), ("a", "b")))
  }

  test("output-column collisions are rejected eagerly") {
    val df = Seq((1L, "u", ts("2024-01-01 10:00:00"), "a"))
      .toDF("event_id", "u", "ts", "to_type")
    intercept[IllegalArgumentException] {
      Journeys.transitionMatrix(df, "u", "ts", "to_type")
    }
  }
}
