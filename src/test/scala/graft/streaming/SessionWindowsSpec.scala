package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SessionWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("batch mode: gap merges and splits sessions; agrees with operators/Sessionize") {
    // key 1: events at 10:00, 10:02, 10:10 with gap 5m -> sessions
    // {00,02} and {10}; key 2: one event
    val events = Seq(
      (1L, ts(0)), (1L, ts(2)), (1L, ts(10)), (2L, ts(30)))
      .toDF("user_id", "ts")
    val got = SessionWindows.sessionize(events, "user_id", "ts",
        gap = "5 minutes", watermark = "0 seconds")
      .orderBy("user_id", "session_start").collect()
    assert(got.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSeq == Seq(
      (1L, ts(0), 2L), (1L, ts(10), 1L), (2L, ts(30), 1L)))
    // session end = last event + gap (engine convention)
    assert(got.head.getTimestamp(2) == Timestamp.valueOf("2024-01-01 10:07:00"))

    // same session STRUCTURE as the batch gap-rule sessionizer
    val viaOperator = graft.operators.Sessionize
      .sessionSummary(events, Seq("user_id"), "ts", "5 minutes")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sessionsPerKey = got.groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    assert(sessionsPerKey == viaOperator)
  }

  test("streaming: sessions merge across microbatches and finalize past the watermark") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sesswin")
    val in = tmp.resolve("in").toString
    // batch 1: two events 2 minutes apart — ONE in-flight session
    Seq((1L, ts(0)), (1L, ts(2))).toDF("user_id", "ts")
      .write.parquet(s"$in/b0")
    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP")
      .parquet(s"$in/*")
    val query = SessionWindows.sessionize(stream, "user_id", "ts",
        gap = "5 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      // nothing finalized yet: watermark (10:02 - 1m) hasn't passed 10:07
      assert(spark.table("sess_out").count() == 0)

      // batch 2: an event 3 minutes later EXTENDS the session (still
      // within gap of 10:02), then a far-future event advances the
      // watermark past the extended session's end
      Seq((1L, ts(5)), (1L, ts(45))).toDF("user_id", "ts")
        .write.parquet(s"$in/b1")
      query.processAllAvailable()
      // one more empty batch so the new watermark finalizes the session
      Seq((2L, ts(59))).toDF("user_id", "ts").write.parquet(s"$in/b2")
      query.processAllAvailable()
      val rows = spark.table("sess_out")
        .orderBy("user_id", "session_start").collect()
      // the merged session covers 10:00-10:05 (+gap) with 3 events; the
      // 10:45 singleton also finalized (the 10:59 event moved the
      // watermark to 10:58, past its 10:50 end)
      assert(rows.map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).toSeq == Seq(
        (1L, ts(0), Timestamp.valueOf("2024-01-01 10:10:00"), 3L),
        (1L, ts(45), Timestamp.valueOf("2024-01-01 10:50:00"), 1L)))
    } finally query.stop()
  }
}
