package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import StatefulOps._

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming dedup absorbs duplicate and stale deliveries across microbatches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stateful")
    val in = tmp.resolve("in").toString

    // batch 1: two keys, one duplicate delivery
    Seq(Change(1L, 10L, "put", "a"), Change(1L, 10L, "put", "a"), Change(2L, 5L, "put", "b"))
      .toDS().write.parquet(s"$in/b0")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Change]].schema)
      .parquet(s"$in/*").as[Change]
    val deduped = dedupUpserts(stream)
    val query = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("update").trigger(Trigger.ProcessingTime(100)).start()
    try {
      query.processAllAvailable()
      val after1 = spark.table("dedup_out").as[Change].collect()
      assert(after1.map(c => (c.key, c.seq)).toSet == Set((1L, 10L), (2L, 5L)))
      assert(after1.length == 2) // duplicate absorbed

      // batch 2: stale event for key 1 (dropped), advancing event for key 2
      Seq(Change(1L, 9L, "put", "stale"), Change(2L, 6L, "put", "b2"))
        .toDS().write.parquet(s"$in/b1")
      query.processAllAvailable()
      val after2 = spark.table("dedup_out").as[Change].collect()
      assert(after2.map(c => (c.key, c.seq)).toSet == Set((1L, 10L), (2L, 5L), (2L, 6L)))
      assert(!after2.exists(_.payload == "stale"))
    } finally query.stop()
  }

  test("running metrics accumulate state across batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-metrics")
    val in = tmp.resolve("in").toString
    Seq(Change(7L, 1L, "put", "x"), Change(7L, 2L, "put", "y")).toDS()
      .write.parquet(s"$in/b0")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Change]].schema)
      .parquet(s"$in/*").as[Change]
    val query = runningMetrics(stream).writeStream
      .format("memory").queryName("metrics_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      Seq(Change(7L, 3L, "put", "z")).toDS().write.parquet(s"$in/b1")
      query.processAllAvailable()
      val rows = spark.table("metrics_out").as[Metric].collect()
      // second emission sees state from the first batch
      assert(rows.map(m => (m.events, m.maxSeq)).toSet == Set((2L, 2L), (3L, 3L)))
    } finally query.stop()
  }

  test("the same dedup logic runs in plain batch mode") {
    val batch = Seq(
      Change(1L, 10L, "put", "a"), Change(1L, 10L, "put", "a"),
      Change(1L, 12L, "put", "c"), Change(3L, 1L, "delete", "d")).toDS()
    val got = dedupUpserts(batch).collect()
    assert(got.map(c => (c.key, c.seq)).toSet == Set((1L, 12L), (3L, 1L)))
  }
}
