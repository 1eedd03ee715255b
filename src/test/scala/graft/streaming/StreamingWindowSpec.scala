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
}
