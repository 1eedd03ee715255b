package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val log = Seq(
    // u1 converts fully, in order
    ("u1", "view", ts("2024-01-01 10:00:00")),
    ("u1", "click", ts("2024-01-01 10:05:00")),
    ("u1", "purchase", ts("2024-01-01 10:10:00")),
    // u2 clicks BEFORE viewing: the click must not count; converts to step 2 later
    ("u2", "click", ts("2024-01-01 09:00:00")),
    ("u2", "view", ts("2024-01-01 10:00:00")),
    ("u2", "click", ts("2024-01-01 11:00:00")),
    // u3 views only
    ("u3", "view", ts("2024-01-01 10:00:00")),
    // u4 never views: absent from the funnel population
    ("u4", "purchase", ts("2024-01-01 10:00:00"))
  ).toDF("u", "etype", "ts")

  test("reach times chain: each step's min ts is at-or-after the previous step's") {
    val got = Funnel.reachTimes(log, "u", "ts", "etype", Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) ->
        ((r.get(1), r.get(2), r.get(3), r.getLong(4)))).toMap
    assert(got.keySet == Set("u1", "u2", "u3"))
    assert(got("u1") == ((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"),
      ts("2024-01-01 10:10:00"), 3L)))
    // u2's 09:00 click is before the view and must not be the reach time
    assert(got("u2") == ((ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), null, 2L)))
    assert(got("u3") == ((ts("2024-01-01 10:00:00"), null, null, 1L)))
  }

  test("a step event at the SAME timestamp as the previous reach counts (>=)") {
    val df = Seq(
      ("u", "view", ts("2024-01-01 10:00:00")),
      ("u", "click", ts("2024-01-01 10:00:00"))).toDF("u", "etype", "ts")
    val r = Funnel.reachTimes(df, "u", "ts", "etype", Seq("view", "click")).head()
    assert(r.getLong(3) == 2L)
  }

  test("stepCounts is the conversion curve") {
    val got = Funnel.stepCounts(log, "u", "ts", "etype", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("stepCounts over a log with no step-1 keys returns 0s, not NULLs") {
    val noViews = log.filter($"etype" =!= "view")
    val got = Funnel.stepCounts(noViews, "u", "ts", "etype", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("duplicate steps and output-column collisions are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Funnel.reachTimes(log, "u", "ts", "etype", Seq("view", "view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.reachTimes(log.withColumnRenamed("etype", "steps_reached"),
        "u", "ts", "steps_reached", Seq("view"))
    }
  }

  test("conversion window: a step past step_1_ts + within does not convert") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes inside the window
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 05:00:00", "click"),
      (1L, "2024-01-01 23:00:00", "purchase"),
      // u2's purchase lands past 1 day after the first view
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-01 12:00:00", "click"),
      (2L, "2024-01-02 06:00:00", "purchase"),
      // u3's click is already past the window -> stuck at step 1
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-03 00:00:00", "click")
    ).map { case (u, t, e) => (u, java.sql.Timestamp.valueOf(t), e) }
      .toDF("user_id", "ts", "event_type")
    val within = Funnel.reachTimes(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), Some("1 day"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("steps_reached")).toMap
    assert(within == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // unbounded form still converts everyone with ordered steps
    val open = Funnel.reachTimes(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("steps_reached")).toMap
    assert(open == Map(1L -> 3L, 2L -> 3L, 3L -> 2L))
    // boundary: exactly at the deadline converts (inclusive bound)
    val edge = Seq(
      (9L, "2024-01-01 00:00:00", "view"),
      (9L, "2024-01-02 00:00:00", "click")
    ).map { case (u, t, e) => (u, java.sql.Timestamp.valueOf(t), e) }
      .toDF("user_id", "ts", "event_type")
    val r = Funnel.reachTimes(edge, "user_id", "ts", "event_type",
      Seq("view", "click"), Some("1 day")).collect().head
    assert(r.getAs[Long]("steps_reached") == 2L)
  }
}
