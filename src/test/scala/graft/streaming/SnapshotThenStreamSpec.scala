package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.config.PipelineConfig

class SnapshotThenStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshot copy then continuous CDC apply against the same target") {
    val tmp = Files.createTempDirectory("graft-sts")
    val snapshotSrc = tmp.resolve("src").toString
    val target = tmp.resolve("target").toString
    val changes = tmp.resolve("changes").toString
    val ckpt = tmp.resolve("ckpt").toString

    // initial table state
    Seq((1L, "v1", 0L), (2L, "v2", 0L), (3L, "v3", 0L))
      .toDF("id", "v", "seq").write.parquet(snapshotSrc)

    val cfg = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $snapshotSrc
         |target.type: parquet
         |target.path: $target
         |target.mode: overwrite
         |""".stripMargin).toOption.get

    val changesSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("op", StringType), StructField("seq", LongType)))

    val handle = SnapshotThenStream.run(spark, cfg, target, s"$changes/*",
      changesSchema, ckpt, Seq("id"), "op", _ => Seq(col("seq").desc),
      triggerMs = 200L)
    try {
      assert(handle.snapshotRows == 3)
      // post-snapshot changes: update 1, delete 2, insert 4
      Seq((1L, "v1b", "put", 10L), (2L, "x", "delete", 11L), (4L, "v4", "put", 12L))
        .toDF("id", "v", "op", "seq").write.parquet(s"$changes/b0")
      handle.query.processAllAvailable()
      val got = spark.read.parquet(target).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(1L -> "v1b", 3L -> "v3", 4L -> "v4"))
      // a change that raced the snapshot re-applies idempotently
      Seq((1L, "v1b", "put", 10L)).toDF("id", "v", "op", "seq")
        .write.parquet(s"$changes/b1")
      handle.query.processAllAvailable()
      val got2 = spark.read.parquet(target).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got2 == got)
    } finally handle.query.stop()
  }

  test("config-driven: a stream.* block runs snapshot-then-stream end to end") {
    val tmp = Files.createTempDirectory("graft-sts-cfg")
    val snapshotSrc = tmp.resolve("src").toString
    val target = tmp.resolve("target").toString
    val changes = tmp.resolve("changes").toString

    Seq((1L, "v1", 0L), (2L, "v2", 0L)).toDF("id", "v", "seq")
      .write.parquet(snapshotSrc)
    // the change feed directory must exist for schema discovery
    Seq((1L, "v1b", "put", 10L)).toDF("id", "v", "op", "seq")
      .write.parquet(s"$changes/b0")

    val cfg = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $snapshotSrc
         |target.type: parquet
         |target.path: $target
         |target.mode: overwrite
         |stream.changesDir: $changes/*
         |stream.checkpointDir: ${tmp.resolve("ckpt")}
         |stream.primaryKey: id
         |stream.orderBy: seq
         |stream.triggerMs: 200
         |""".stripMargin).fold(e => fail(e), identity)
    assert(cfg.stream.get.opColumn == "op") // default

    val handle = SnapshotThenStream.runFromConfig(spark, cfg)
    try {
      assert(handle.snapshotRows == 2)
      handle.query.processAllAvailable()
      val got = spark.read.parquet(target).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(1L -> "v1b", 2L -> "v2"))
    } finally handle.query.stop()
  }

  test("stream config validation: missing checkpoint / pk / order are load-time errors") {
    def base(extra: String) = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: /tmp/x
         |target.type: parquet
         |target.path: /tmp/y
         |$extra""".stripMargin)
    assert(base("stream.changesDir: /tmp/c\n").isLeft)              // no checkpoint
    assert(base("stream.changesDir: /tmp/c\nstream.checkpointDir: /tmp/k\n").isLeft) // no pk
    assert(base("stream.changesDir: /tmp/c\nstream.checkpointDir: /tmp/k\n" +
      "stream.primaryKey: id\n").isLeft)                            // no orderBy
    assert(base("stream.changesDir: /tmp/c\nstream.checkpointDir: /tmp/k\n" +
      "stream.primaryKey: id\nstream.orderBy: seq\n").isRight)
  }
}
