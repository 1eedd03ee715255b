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

  test("NULL keys group into one partition (SQL window-partition semantics)") {
    val df = Seq(
      (1L, Option("u"), ts("2024-01-01 10:00:00")),
      (2L, Option.empty[String], ts("2024-01-01 10:00:00")),
      (3L, Option.empty[String], ts("2024-01-01 12:00:00"))).toDF("event_id", "u", "ts")
    val got = Sessionize.sessionize(df, Seq("u"), "ts", "30 minutes", Seq(col("event_id")))
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the two NULL-key events share a partition: far apart → sessions 1 and 2
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("NULL timestamps sort first, each as its own leading session") {
    val df = Seq(
      (1L, "u", Option(ts("2024-01-01 10:00:00"))),
      (2L, "u", Option.empty[Timestamp]),
      (3L, "u", Option.empty[Timestamp]),
      (4L, "u", Option(ts("2024-01-01 10:05:00")))).toDF("event_id", "u", "ts")
    val got = Sessionize.sessionize(df, Seq("u"), "ts", "30 minutes", Seq(col("event_id")))
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a NULL timestamp has an unknowable gap to any neighbour, so it
    // cannot extend a session: each NULL-ts row splits off (lag of a
    // NULL ts is NULL — same signal as "no previous row"), and the
    // first real timestamp opens a fresh session after them
    assert(got == Map(2L -> 1L, 3L -> 2L, 1L -> 3L, 4L -> 3L))
  }

  test("reserved output / internal column names are rejected") {
    val df = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("event_id", "u", "ts")
    intercept[IllegalArgumentException] {
      Sessionize.sessionize(df.withColumn("session_seq", lit(9L)), Seq("u"), "ts", "30 minutes")
    }
    intercept[IllegalArgumentException] {
      Sessionize.sessionSummary(df.withColumnRenamed("u", "__n"), Seq("__n"), "ts", "30 minutes")
    }
  }

  test("property sweep: session assignment equals a driver-side fold on random streams") {
    val rng = new scala.util.Random(20260812L)
    val base = ts("2024-01-01 00:00:00").getTime
    for (trial <- 1 to 3) {
      val events = (1 to 400).map { i =>
        (i.toLong, s"u${rng.nextInt(5)}",
          new Timestamp(base + rng.nextInt(36000).toLong * 1000))
      }
      val expected: Map[Long, Long] = events.groupBy(_._2).flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._3.getTime, e._1))
        var seqNo = 0L
        var prev = Option.empty[Long]
        sorted.map { e =>
          if (prev.isEmpty || e._3.getTime - prev.get > 30L * 60000) seqNo += 1
          prev = Some(e._3.getTime)
          e._1 -> seqNo
        }
      }
      val got = Sessionize.sessionize(events.toDF("event_id", "u", "ts"),
          Seq("u"), "ts", "30 minutes", Seq(col("event_id")))
        .select("event_id", "session_seq").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial=$trial")
    }
  }

  test("sessions: per-session start/end, integer millis duration, event count") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L),
      (1L, "2024-01-01 00:10:00", 2L),
      (1L, "2024-01-01 09:00:00", 3L),   // > 6h gap: new session
      (2L, "2024-01-01 01:00:00", 4L)
    ).map { case (u, t, e) => (u, java.sql.Timestamp.valueOf(t), e) }
      .toDF("user_id", "ts", "event_id")
    val got = Sessionize.sessions(ev, Seq("user_id"), "ts", "6 hours",
        Seq(org.apache.spark.sql.functions.col("event_id")))
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("duration_ms"), r.getAs[Long]("n_events"))).toSeq
    assert(got == Seq((1L, 1L, 600000L, 2L), (1L, 2L, 0L, 1L), (2L, 1L, 0L, 1L)))
  }
}
