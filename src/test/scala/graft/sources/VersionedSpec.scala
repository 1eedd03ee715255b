package graft.sources

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VersionedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("publish/readLatest/time-travel: a resolved reader never sees a later publish") {
    val root = Files.createTempDirectory("graft-ver").resolve("t").toString
    assert(Versioned.latestVersion(spark, root).isEmpty)
    val v1 = Versioned.publish(Seq((1L, "a")).toDF("k", "v"), root)
    assert(v1 == 1L)
    val snapshotAtV1 = Versioned.readLatest(spark, root) // resolved NOW
    val v2 = Versioned.publish(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    assert(v2 == 2L && Versioned.latestVersion(spark, root).contains(2L))
    // the pre-publish reader still reads version 1's immutable dir
    assert(snapshotAtV1.count() == 1)
    assert(Versioned.readLatest(spark, root).count() == 2)
    assert(Versioned.readVersion(spark, root, 1L).count() == 1)
    assert(Versioned.versions(spark, root) == Seq(1L, 2L))
  }

  test("source.versionAt: config-driven time travel reads the pinned version") {
    val base = Files.createTempDirectory("graft-ver-tt")
    val root = base.resolve("t").toString
    Versioned.publish(Seq((1L, "old")).toDF("k", "v"), root)
    Versioned.publish(Seq((1L, "new"), (2L, "new2")).toDF("k", "v"), root)
    def cfg(extra: String) = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $root
         |source.versioned: true
         |$extra
         |target.type: parquet
         |target.path: ${base.resolve(s"out${extra.hashCode}")}
         |target.mode: overwrite
         |""".stripMargin)
    // pinned to v1: the audit read sees exactly the old snapshot
    val pinned = cfg("source.versionAt: 1").fold(e => fail(e), identity)
    val got = graft.Pipeline.read(spark, pinned).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "old")))
    // unpinned resolves _LATEST as before
    val latest = cfg("").fold(e => fail(e), identity)
    assert(graft.Pipeline.read(spark, latest).count() == 2)
    // a vacuumed/never-published version fails eagerly with the reason
    val gone = cfg("source.versionAt: 9").fold(e => fail(e), identity)
    val e = intercept[IllegalArgumentException](graft.Pipeline.read(spark, gone))
    assert(e.getMessage.contains("not found"))
    // versionAt without versioned: true is a parse error, not a silent read
    assert(graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $root
         |source.versionAt: 1
         |target.type: parquet
         |target.path: ${base.resolve("x")}
         |target.mode: overwrite
         |""".stripMargin).isLeft)
    // redacted render surfaces the pin (operators grep run logs for it)
    assert(pinned.renderRedacted.contains("versionAt=1"))
  }

  test("diffVersions classifies added/removed/changed/match between publishes") {
    val root = Files.createTempDirectory("graft-ver-diff").resolve("t").toString
    Versioned.publish(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root)
    Versioned.publish(Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v"), root)
    val got = Versioned.diffVersions(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "match", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    // explicit compare columns narrow the change test
    val kOnly = Versioned.diffVersions(spark, root, 1L, 2L, Seq("k"), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kOnly(2L) == "match") // value change invisible when only k compares
  }

  test("compaction into the next version removes the concurrent-reader caveat") {
    val root = Files.createTempDirectory("graft-ver2").resolve("t").toString
    // many-small-file v1 (as a streaming sink would leave it)
    val small = (0 until 8).map(i => Seq((i.toLong, s"v$i")).toDF("k", "v"))
      .reduce(_.unionByName(_)).repartition(8)
    Versioned.publish(small, root)
    val reader = Versioned.readLatest(spark, root)
    // maintenance: rewrite coalesced INTO v2, never touching v1
    Versioned.publish(Versioned.readLatest(spark, root).coalesce(1), root)
    assert(reader.count() == 8)                 // v1 reader unbroken
    val v2files = new Path(root, "v_0000000002")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new Path(root, "v_0000000002"))
      .count(s => s.getPath.getName.endsWith(".parquet"))
    assert(v2files == 1)
    assert(Versioned.readLatest(spark, root).orderBy("k").collect().toSeq ==
      reader.orderBy("k").collect().toSeq)
  }

  test("vacuum keeps the newest K published versions and sweeps crash orphans") {
    val root = Files.createTempDirectory("graft-ver3").resolve("t").toString
    (1 to 4).foreach(i => Versioned.publish(Seq((i.toLong, "x")).toDF("k", "v"), root))
    // crashed publish: directory exists, pointer never swapped
    Seq((99L, "orphan")).toDF("k", "v")
      .write.parquet(new Path(root, "v_0000000009").toString)
    assert(Versioned.versions(spark, root) == Seq(1L, 2L, 3L, 4L, 9L))
    val retired = Versioned.vacuum(spark, root, keep = 2)
    assert(retired.sorted == Seq(1L, 2L, 9L))
    assert(Versioned.versions(spark, root) == Seq(3L, 4L))
    assert(Versioned.readLatest(spark, root).collect().head.getLong(0) == 4L)
    // the next publish continues the sequence past the vacuumed range
    assert(Versioned.publish(Seq((5L, "y")).toDF("k", "v"), root) == 5L)
  }

  test("vacuum minAgeMs retention floor protects young versions and orphans") {
    val root = Files.createTempDirectory("graft-ver-age").resolve("t").toString
    (1 to 3).foreach(i => Versioned.publish(Seq((i.toLong, "x")).toDF("k", "v"), root))
    // in-progress publish's orphan — a concurrent vacuum must not eat it
    Seq((99L, "orphan")).toDF("k", "v")
      .write.parquet(new Path(root, "v_0000000009").toString)
    // everything here was published milliseconds ago: a 1-hour floor
    // retires NOTHING (an in-flight reader of v1/v2 keeps its files)
    assert(Versioned.vacuum(spark, root, keep = 1, minAgeMs = 3600000L).isEmpty)
    assert(Versioned.versions(spark, root) == Seq(1L, 2L, 3L, 9L))
    // and a reader that resolved an old version mid-flight still scans
    assert(Versioned.readVersion(spark, root, 1L).count() == 1)
    // floor elapsed: age is measured from the _graft_commit.json stamp
    // written at publish (dir mtimes are untrustworthy — HDFS bumps
    // them on child changes, S3A synthesizes them), so back-date the
    // STAMP for published versions and the data-file mtimes for the
    // stampless crash orphan (its fallback signal)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 7200000L
    Seq(1L, 2L).foreach { n =>
      val stamp = new Path(new Path(root, f"v_$n%010d"), "_graft_commit.json")
      val out = fs.create(stamp, true)
      try out.write(s"""{"publishedAtMs":$old}""".getBytes("UTF-8"))
      finally out.close()
    }
    fs.listStatus(new Path(root, "v_0000000009"))
      .foreach(s => fs.setTimes(s.getPath, old, -1))
    // an HDFS-style later touch to the version DIR must not postpone
    // retirement — the stamp, not the directory mtime, is the clock
    fs.setTimes(new Path(root, "v_0000000001"), System.currentTimeMillis(), -1)
    val retired = Versioned.vacuum(spark, root, keep = 1, minAgeMs = 3600000L)
    assert(retired.sorted == Seq(1L, 2L, 9L))
    assert(Versioned.versions(spark, root) == Seq(3L))
  }

  test("racing publishers: loser fails cleanly on errorifexists, winner readable") {
    val root = Files.createTempDirectory("graft-ver-race").resolve("t").toString
    Versioned.publish(Seq((1L, "base")).toDF("k", "v"), root)
    // both publishers compute next=2; B lands its full publish while A
    // is still "writing" — A's errorifexists write then refuses the dir
    intercept[Exception] {
      Versioned.publishWith(spark, root) { dir =>
        Versioned.publish(Seq((2L, "winner")).toDF("k", "v"), root)
        Seq((2L, "loser")).toDF("k", "v").write.mode("errorifexists").parquet(dir)
      }
    }
    // pointer names the winner's complete version; no torn state
    assert(Versioned.latestVersion(spark, root).contains(2L))
    assert(Versioned.readLatest(spark, root).select("v").as[String]
      .collect().toSeq == Seq("winner"))
  }

  test("config e2e: target.versioned publishes through Pipeline.run with validation") {
    val root = java.nio.file.Files.createTempDirectory("graft-ver4").resolve("t").toString
    def cfg(where: String) = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/orders.parquet
         |source.where: $where
         |target.type: parquet
         |target.path: $root
         |target.versioned: true
         |target.statsIndex: o_orderkey
         |validation.primaryKey: o_orderkey
         |validation.compareColumns: o_totalprice
         |""".stripMargin).fold(e => fail(s"parse failed: $e"), identity)
    val r1 = graft.Pipeline.run(spark, cfg("o_orderkey <= 1000"))
    assert(Versioned.latestVersion(spark, root).contains(1L))
    assert(r1.validation.get.isEmpty, "self-validation of a fresh publish must be clean")
    val v1Reader = Versioned.readLatest(spark, root)
    val r2 = graft.Pipeline.run(spark, cfg("o_orderkey <= 2000"))
    assert(Versioned.latestVersion(spark, root).contains(2L))
    assert(r2.rowsCopied > r1.rowsCopied)
    assert(v1Reader.count() == r1.rowsCopied)   // old reader unbroken
    assert(Versioned.readLatest(spark, root).count() == r2.rowsCopied)
    // the stats index lives inside the version dir it describes
    assert(spark.read.parquet(s"$root/v_0000000002/_stats").count() > 0)
    // savepoints + versioned rejected eagerly
    val bad = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |target.versioned: true
         |savepoints.dir: /tmp/sp
         |""".stripMargin)
    assert(bad.swap.exists(_.contains("versioned publishes whole immutable")))
  }

  test("source.versioned reads the latest snapshot; versioned-to-versioned chains") {
    val srcRoot = java.nio.file.Files.createTempDirectory("graft-ver5").resolve("s").toString
    val dstRoot = java.nio.file.Files.createTempDirectory("graft-ver5").resolve("d").toString
    Versioned.publish(Seq((1L, "old")).toDF("k", "v"), srcRoot)
    Versioned.publish(Seq((1L, "new"), (2L, "b")).toDF("k", "v"), srcRoot)
    val cfg = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $srcRoot
         |source.versioned: true
         |target.type: parquet
         |target.path: $dstRoot
         |target.versioned: true
         |""".stripMargin).fold(e => fail(s"parse failed: $e"), identity)
    assert(cfg.renderRedacted.contains("versioned"))
    val r = graft.Pipeline.run(spark, cfg)
    assert(r.rowsCopied == 2)
    assert(Versioned.readLatest(spark, dstRoot).orderBy("k")
      .collect().map(_.getString(1)).toSeq == Seq("new", "b"))
    // unpublished source root fails loudly, not with an empty copy
    val none = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${srcRoot}_missing
         |source.versioned: true
         |target.type: parquet
         |target.path: ${dstRoot}2
         |""".stripMargin).fold(e => fail(s"parse failed: $e"), identity)
    val e = intercept[Exception](graft.Pipeline.run(spark, none))
    assert(e.getMessage.contains("no published version"))
  }
}
