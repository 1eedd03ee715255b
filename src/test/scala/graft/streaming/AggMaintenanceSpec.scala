package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.IncrementalAgg._

class AggMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")
  private val metrics = Seq(CountRows("n"), SumOf("v", "s"), MaxOf("v", "mx"))

  private def batchDf(i: Int): DataFrame =
    (1 to 30).map(j => (s"k${j % 3}", (i * 1000 + j).toLong)).toDF("k", "v")

  test("incremental absorption across batches equals the one-shot aggregate") {
    val store = Files.createTempDirectory("graft-aggm").resolve("store").toString
    (0 until 4).foreach(i =>
      assert(AggMaintenance.mergeIntoStore(batchDf(i), i.toLong, store, keys, metrics)))
    val got = AggMaintenance.readStore(spark, store)
    val full = graft.operators.IncrementalAgg.aggregate(
      (0 until 4).map(batchDf).reduce(_.unionAll(_)), keys, metrics)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
  }

  test("a replayed batch id is skipped — no double counting") {
    val store = Files.createTempDirectory("graft-aggm-r").resolve("store").toString
    assert(AggMaintenance.mergeIntoStore(batchDf(0), 0L, store, keys, metrics))
    assert(AggMaintenance.mergeIntoStore(batchDf(1), 1L, store, keys, metrics))
    val before = AggMaintenance.readStore(spark, store).collect().toSet
    assert(!AggMaintenance.mergeIntoStore(batchDf(1), 1L, store, keys, metrics))
    assert(!AggMaintenance.mergeIntoStore(batchDf(0), 0L, store, keys, metrics))
    val after = AggMaintenance.readStore(spark, store).collect().toSet
    assert(before == after)
  }

  test("crash between swap steps recovers through SwapStore's read path") {
    val store = Files.createTempDirectory("graft-aggm-c").resolve("store").toString
    assert(AggMaintenance.mergeIntoStore(batchDf(0), 0L, store, keys, metrics))
    // simulate a crash after rename-aside, before swap-in
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + "__old"))
    assert(AggMaintenance.mergeIntoStore(batchDf(1), 1L, store, keys, metrics))
    val got = AggMaintenance.readStore(spark, store)
    val full = graft.operators.IncrementalAgg.aggregate(
      batchDf(0).unionAll(batchDf(1)), keys, metrics)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
  }

  test("maintenance runs from foreachBatch on a live stream, restart-safe ids") {
    val dir = Files.createTempDirectory("graft-aggm-stream")
    val srcDir = dir.resolve("in")
    Files.createDirectories(srcDir)
    val store = dir.resolve("store").toString
    def write(name: String, base: Int, rows: Int): Unit =
      Files.write(srcDir.resolve(name),
        (1 to rows).map(i => s"""{"k": "g${i % 2}", "v": ${base + i}}""")
          .mkString("\n").getBytes("UTF-8"))
    write("b0.json", 0, 50)
    val schema = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    def start() = spark.readStream.schema(schema).json(srcDir.toString)
      .writeStream
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        AggMaintenance.mergeIntoStore(batch, id, store, keys, metrics); ()
      }
      .start()
    val q = start()
    try {
      q.processAllAvailable()
      assert(AggMaintenance.readStore(spark, store)
        .collect().map(_.getLong(1)).sum == 50L, "b0 not absorbed")
      write("b1.json", 1000, 30)
      q.processAllAvailable()
      assert(AggMaintenance.readStore(spark, store)
        .collect().map(_.getLong(1)).sum == 80L, "b1 not absorbed")
    } finally q.stop()
    // restart the query: replays nothing new, store unchanged
    val before = AggMaintenance.readStore(spark, store).collect().toSet
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val after = AggMaintenance.readStore(spark, store).collect().toSet
    assert(before == after)
    assert(after.toSeq.map(_.getLong(1)).sum == 80L) // 50 + 30 rows, counted once
  }
}
