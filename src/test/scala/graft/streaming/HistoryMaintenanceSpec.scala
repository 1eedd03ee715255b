package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Scd2

class HistoryMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def opsDf(rows: Seq[(Long, String, String, Timestamp, Double)]): DataFrame =
    rows.toDF("seq", "k", "op", "ts", "v")

  private val wave1 = Seq(
    (1L, "k1", "upsert", ts("2024-01-01 00:00:00"), 10.0),
    (2L, "k2", "upsert", ts("2024-01-01 00:00:00"), 1.0),
    (3L, "k1", "upsert", ts("2024-01-02 00:00:00"), 20.0))
  private val wave2 = Seq(
    (4L, "k1", "delete", ts("2024-01-03 00:00:00"), 0.0),
    (5L, "k3", "upsert", ts("2024-01-03 00:00:00"), 7.0))
  private val wave3 = Seq(
    (6L, "k1", "upsert", ts("2024-01-04 00:00:00"), 30.0))

  private def absorb(store: String, rows: Seq[(Long, String, String, Timestamp, Double)],
                     id: Long): Boolean =
    HistoryMaintenance.mergeIntoStore(opsDf(rows), id, store,
      "k", "ts", "op", "upsert", "delete", Seq("v"), Seq("seq"))

  test("batch-by-batch absorption equals the one-shot history; replays skipped") {
    val store = Files.createTempDirectory("graft-histm").resolve("store").toString
    assert(absorb(store, wave1, 0L))
    assert(absorb(store, wave2, 1L))
    assert(!absorb(store, wave2, 1L)) // replay: no duplicate versions
    assert(absorb(store, wave3, 2L))
    val got = HistoryMaintenance.readStore(spark, store).collect().toSet
    val full = Scd2.buildHistory(opsDf(wave1 ++ wave2 ++ wave3),
      "k", "ts", "op", "upsert", "delete", Seq("v"), Seq(col("seq"))).collect().toSet
    assert(got == full)
    // the delete closed k1's v=20, wave3 reopened k1 at v=30
    val k1 = got.filter(_.getString(0) == "k1")
    assert(k1.count(r => r.getBoolean(4)) == 1)
  }

  test("history maintained from a live stream via foreachBatch") {
    val dir = Files.createTempDirectory("graft-histm-stream")
    val srcDir = dir.resolve("in"); Files.createDirectories(srcDir)
    val store = dir.resolve("store").toString
    def writeWave(name: String, rows: Seq[(Long, String, String, Timestamp, Double)]): Unit =
      Files.write(srcDir.resolve(name),
        rows.map { case (seq, k, op, t, v) =>
          s"""{"seq": $seq, "k": "$k", "op": "$op", "ts": "$t", "v": $v}"""
        }.mkString("\n").getBytes("UTF-8"))
    writeWave("w0.json", wave1)
    val schema = StructType(Seq(StructField("seq", LongType), StructField("k", StringType),
      StructField("op", StringType), StructField("ts", TimestampType),
      StructField("v", DoubleType)))
    val q = spark.readStream.schema(schema).json(srcDir.toString)
      .writeStream
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        HistoryMaintenance.mergeIntoStore(batch, id, store,
          "k", "ts", "op", "upsert", "delete", Seq("v"), Seq("seq")); ()
      }
      .start()
    try {
      q.processAllAvailable()
      writeWave("w1.json", wave2 ++ wave3)
      q.processAllAvailable()
    } finally q.stop()
    val got = HistoryMaintenance.readStore(spark, store)
      .select("k", "v", "valid_from", "valid_to", "is_current").collect().toSet
    val full = Scd2.buildHistory(opsDf(wave1 ++ wave2 ++ wave3),
        "k", "ts", "op", "upsert", "delete", Seq("v"), Seq(col("seq")))
      .collect().toSet
    assert(got == full)
  }
}
