package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CdcApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("latestByKey keeps the newest record per key with deterministic ties") {
    val df = Seq(
      (1L, 100L, "old"), (1L, 200L, "new"),
      (2L, 100L, "a"), (2L, 100L, "b") // ts tie -> higher seq wins? order by value desc here
    ).toDF("user_id", "ts", "v")
    val got = CdcApply.latestByKey(df, Seq("user_id"), Seq(col("ts").desc, col("v").desc))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "new", 2L -> "b"))
  }

  test("applyBatch merges puts and deletes with last-change-wins inside the batch") {
    // target schema = change schema minus op (the version column rides along)
    val current = Seq((1L, "v1", 0L), (2L, "v2", 0L), (3L, "v3", 0L)).toDF("id", "v", "seq")
    val changes = Seq(
      (1L, "v1b", "put", 10L),    // update
      (2L, "ignored", "delete", 10L), // delete
      (4L, "v4", "put", 10L),     // insert
      (5L, "first", "put", 10L), (5L, "second", "put", 20L) // within-batch upsert
    ).toDF("id", "v", "op", "seq")
    val merged = CdcApply.applyBatch(current, changes, Seq("id"), "op",
      Seq(col("seq").desc))
    val got = merged.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "v1b", 3L -> "v3", 4L -> "v4", 5L -> "second"))
  }

  test("streaming end-to-end: file change feed applied via foreachBatch") {
    val tmp = Files.createTempDirectory("graft-cdc")
    val changesDir = tmp.resolve("changes").toString
    val targetPath = tmp.resolve("target").toString
    val checkpoint = tmp.resolve("ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType)))

    Seq((1L, "a", "put", 1L), (2L, "b", "put", 2L))
      .toDF("id", "v", "op", "seq").write.parquet(changesDir + "/batch0")
    val query = CdcApply.run(spark, changesDir + "/*", schema, targetPath, checkpoint,
      Seq("id"), "op", _ => Seq(col("seq").desc), triggerMs = 250L)
    try {
      query.processAllAvailable()
      val after1 = spark.read.parquet(targetPath).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(after1 == Map(1L -> "a", 2L -> "b"))

      Seq((1L, "a2", "put", 3L), (2L, "x", "delete", 4L), (3L, "c", "put", 5L))
        .toDF("id", "v", "op", "seq").write.parquet(changesDir + "/batch1")
      query.processAllAvailable()
      val after2 = spark.read.parquet(targetPath).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(after2 == Map(1L -> "a2", 3L -> "c"))

      // crash simulation: death between the rename-aside and the swap
      // leaves dst missing and dst__old holding the state — the next
      // batch must restore it, not reset to empty and delete the backup
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.rename(new org.apache.hadoop.fs.Path(targetPath),
        new org.apache.hadoop.fs.Path(targetPath + "__old"))
      Seq((4L, "d", "put", 6L)).toDF("id", "v", "op", "seq")
        .write.parquet(changesDir + "/batch2")
      query.processAllAvailable()
      val after3 = spark.read.parquet(targetPath).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(after3 == Map(1L -> "a2", 3L -> "c", 4L -> "d")) // pre-crash rows survive
    } finally query.stop()
  }

  test("changesBetween round-trip law: apply(prev, extract(prev, next)) == next") {
    import spark.implicits._
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val next = Seq((1L, "a", 10.0),            // unchanged: no op emitted
                   (2L, "B", 20.0),            // changed -> put
                   (4L, "d", 40.0))            // new -> put; 3 gone -> delete
      .toDF("id", "name", "v")
    val changes = CdcApply.changesBetween(prev, next, Seq("id"))
    val got = changes.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(3))).toSeq
    assert(got == Seq((2L, Some("B"), "put"), (3L, None, "delete"), (4L, Some("d"), "put")))
    // the op log is delta-sized and replays to exactly `next`
    val replayed = CdcApply.applyBatch(prev, changes, Seq("id"), "op",
      Seq(org.apache.spark.sql.functions.lit(1)))
    assert(replayed.exceptAll(next).isEmpty && next.exceptAll(replayed).isEmpty)
    // self-diff is empty
    assert(CdcApply.changesBetween(next, next, Seq("id")).isEmpty)
  }
}
