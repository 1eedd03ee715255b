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

  test("attribution: first/last/linear-ppm over converting journeys only") {
    import spark.implicits._
    val ev = Seq(
      // u1: view -> click -> view -> PURCHASE (3 touches)
      (1L, "2024-01-01 01:00:00", "view", 1L),
      (1L, "2024-01-01 02:00:00", "click", 2L),
      (1L, "2024-01-01 03:00:00", "view", 3L),
      (1L, "2024-01-01 04:00:00", "purchase", 4L),
      (1L, "2024-01-01 05:00:00", "click", 5L),   // post-conversion: no credit
      // u2: click only, never converts -> contributes nothing
      (2L, "2024-01-01 01:00:00", "click", 6L),
      // u3: single view then purchase
      (3L, "2024-01-01 01:00:00", "view", 7L),
      (3L, "2024-01-01 02:00:00", "purchase", 8L)
    ).map { case (u, t, e, id) => (u, java.sql.Timestamp.valueOf(t), e, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Journeys.attribution(ev, "user_id", "ts", "event_type",
        "purchase", Seq("view", "click"), Seq(col("event_id")))
      .orderBy("touch_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // u1: first=view, last=view, 2 views + 1 click each earn 333333 ppm
    // u3: first=last=view, 1 view earns 1000000 ppm
    assert(got.toSeq == Seq(
      ("click", 0L, 0L, 1L, 333333L),
      ("view", 2L, 2L, 3L, 333333L * 2 + 1000000L)))
  }
}
