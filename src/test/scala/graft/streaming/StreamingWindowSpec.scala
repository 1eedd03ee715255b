package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Structured Streaming windowed aggregation with watermark, driven from
  * the events fixture as a file stream and checked against the identical
  * batch plan — the streams-are-tables property that lets the engine
  * share one aggregation definition between live and backfill paths.
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming hourly window agg equals the batch result") {
    val batchEvents = Tables.load(spark, TestSpark.sf, "events")
    // stage the (ns-timestamp-normalized) events as a stream source dir
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts_tz", col("ts").cast("timestamp"))
      .withWatermark("ts_tz", "1 hour")
      .groupBy(window(col("ts_tz"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val streamed = agg(spark.readStream.schema(schema).parquet(s"$tmp/in"))
    val query = streamed.writeStream
      .format("memory").queryName("stream_out").outputMode("complete").start()
    try query.processAllAvailable() finally query.stop()

    val got = spark.table("stream_out")
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val expected = agg(batchEvents)
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("append mode: watermark finalizes windows and evicts their state") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-wm").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 0: two events in the 10:00 window
    Seq((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:20:00"), "a"))
      .toDF("ts", "k").write.parquet(s"$tmp/in/b0")
    val schema = spark.read.parquet(s"$tmp/in/b0").schema

    val streamed = spark.readStream.schema(schema).parquet(s"$tmp/in/*")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"))
    val query = streamed.writeStream
      .format("memory").queryName("wm_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      // watermark (10:20 - 30min) has not passed the 10:00 window's end:
      // nothing finalized yet — the window is still open for late data
      assert(spark.table("wm_out").isEmpty)

      // batch 1: an event far ahead advances the watermark past 11:00
      Seq((ts("2024-01-01 13:00:00"), "a")).toDF("ts", "k")
        .write.parquet(s"$tmp/in/b1")
      query.processAllAvailable()
      val got = spark.table("wm_out")
        .select(col("window.start").cast("string"), col("k"), col("n")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // the 10:00 window finalized with both events; the 13:00 window is
      // still open (its state survives, not yet emitted)
      assert(got == Set(("2024-01-01 10:00:00", "a", 2L)))
    } finally query.stop()
  }
}
