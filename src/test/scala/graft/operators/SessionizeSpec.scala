package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap larger than the threshold starts a new session") {
    val df = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:20:00")),  // same session (20 min)
      (3L, "u1", ts("2024-01-01 11:00:00")),  // 40 min > 30 min: new session
      (4L, "u2", ts("2024-01-01 10:00:00"))).toDF("event_id", "u", "ts")
    val got = Sessionize.sessionize(df, Seq("u"), "ts", "30 minutes", Seq(col("event_id")))
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("summary counts sessions and the largest session per key") {
    val df = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:10:00")),
      (3L, "u1", ts("2024-01-01 12:00:00"))).toDF("event_id", "u", "ts")
    val got = Sessionize.sessionSummary(df, Seq("u"), "ts", "30 minutes", Seq(col("event_id")))
      .select("u", "n_sessions", "longest_session").head()
    assert(got.getLong(1) == 2L && got.getLong(2) == 2L)
  }

  test("a gap exactly equal to the threshold stays in the session (strict >)") {
    val df = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),
      (2L, "u", ts("2024-01-01 10:30:00"))).toDF("event_id", "u", "ts")
    val got = Sessionize.sessionize(df, Seq("u"), "ts", "30 minutes", Seq(col("event_id")))
      .agg(max("session_seq")).head().getLong(0)
    assert(got == 1L)
  }
}
