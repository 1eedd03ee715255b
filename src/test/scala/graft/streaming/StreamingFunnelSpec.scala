package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import StreamingFunnel._

class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  // in-order per key; interleaved across keys; one replayed delivery
  private val batch1 = Seq(
    FunnelEvent(1L, 1000L, 1L, "view"),
    FunnelEvent(2L, 1000L, 2L, "click"),   // click before any view: must not count
    FunnelEvent(1L, 2000L, 3L, "click"),
    FunnelEvent(2L, 3000L, 4L, "view"))
  private val batch2 = Seq(
    FunnelEvent(1L, 2000L, 3L, "click"),   // at-least-once replay: idempotent
    FunnelEvent(1L, 5000L, 5L, "purchase"),
    FunnelEvent(2L, 6000L, 6L, "click"))

  test("streaming reach across microbatches equals the batch funnel") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sfunnel")
    val in = tmp.resolve("in").toString
    batch1.toDS().write.parquet(s"$in/b0")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[FunnelEvent]].schema)
      .parquet(s"$in/*").as[FunnelEvent]
    val query = track(stream, steps).writeStream
      .format("memory").queryName("sfunnel_out").outputMode("update").start()
    try {
      query.processAllAvailable()
      batch2.toDS().write.parquet(s"$in/b1")
      query.processAllAvailable()
      // latest row per key is the key's final state
      val got = spark.table("sfunnel_out").as[FunnelReach].collect()
        .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.stepsReached) }
      assert(got(1L).reach == Seq(Some(1000L), Some(2000L), Some(5000L)))
      assert(got(1L).stepsReached == 3)
      assert(got(2L).reach == Seq(Some(3000L), Some(6000L), None))
      assert(got(2L).stepsReached == 2)

      // parity with the batch operator over the union of all events
      val all = (batch1 ++ batch2).map(e => (e.key, e.ts, e.etype))
        .toDF("user", "ts", "etype")
        .withColumn("ts", timestamp_micros(col("ts")))
      val batchReach = graft.operators.Funnel
        .reachTimes(all, "user", "ts", "etype", steps)
        .select(col("user"), unix_micros(col("step_1_ts")), unix_micros(col("step_2_ts")),
          unix_micros(col("step_3_ts")))
        .collect().map(r => r.getLong(0) -> (1 to 3).map(i =>
          Option(r.get(i)).map(_.asInstanceOf[Long]))).toMap
      for (k <- Seq(1L, 2L))
        assert(got(k).reach == batchReach(k))
    } finally query.stop()
  }

  test("batch-mode state spans the whole dataset") {
    val got = track((batch1 ++ batch2).toDS(), steps).collect()
      .map(r => r.key -> r.stepsReached).toMap
    assert(got == Map(1L -> 3, 2L -> 2))
  }
}
