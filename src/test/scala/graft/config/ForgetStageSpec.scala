package graft.config

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Pipeline, TestSpark}

/** The declarative RTBF stage: the piped rows are the forget batch,
  * the store stops returning the ids, re-admission stays possible, and
  * rows pass through to the audit target. The annIndex arm is gated
  * end-to-end (q_cfg_forget); this spec covers the lexIndex,
  * nearDupStore, and linkGraph arms plus parse validation.
  */
class ForgetStageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runForget(store: String, root: String, batch: org.apache.spark.sql.DataFrame,
                        idCol: String): String = {
    val base = Files.createTempDirectory("graft-forgetstage")
    val src = base.resolve("batch").toString
    val out = base.resolve("audit").toString
    batch.write.parquet(src)
    val cfg = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |transforms: forget
         |transform.forget.store: $store
         |transform.forget.root: $root
         |transform.forget.idColumn: $idCol
         |""".stripMargin).fold(e => fail(s"parse failed: $e"), identity)
    Pipeline.run(spark, cfg)
    out
  }

  test("lexIndex arm: forgotten doc leaves every hit list; batch passes through") {
    val root = Files.createTempDirectory("fs-lex").resolve("ix").toString
    val corpus = Seq((1L, "spark joins data"), (2L, "spark windows"),
      (3L, "spark spark spark")).toDF("id", "text")
    graft.pipeline.LexIndex.create(corpus, "id", "text", root)
    val out = runForget("lexIndex", root, Seq(3L).toDF("doc"), "doc")
    val hits = graft.pipeline.LexIndex.search(spark, root,
        Seq(("q", "spark")).toDF("qid", "term"), "qid", "term", 10)
      .select("id").as[Long].collect().toSet
    assert(hits === Set(1L, 2L))
    assert(spark.read.parquet(out).as[Long].collect().toSeq === Seq(3L))
  }

  test("nearDupStore arm: forgotten doc no longer suppresses its duplicates") {
    val root = Files.createTempDirectory("fs-nd").resolve("store").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    graft.pipeline.Dedup.NearDupStore.create(
      Seq((1L, text)).toDF("id", "text"), "id", "text", root)
    val probe = Seq((10L, text)).toDF("id", "text")
    // before: the stored twin suppresses the probe row
    assert(graft.pipeline.Dedup.NearDupStore.dropNearDups(
      probe, "id", "text", root).count() === 0L)
    runForget("nearDupStore", root, Seq(1L).toDF("gone"), "gone")
    // after: nothing left to match against
    assert(graft.pipeline.Dedup.NearDupStore.dropNearDups(
      probe, "id", "text", root).count() === 1L)
  }

  test("linkGraph arm: forgotten vertex leaves the graph; survivor ranks exact") {
    val root = Files.createTempDirectory("fs-lg").resolve("g").toString
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L).toDF("src", "dst")
    graft.pipeline.LinkGraph.create(edges, "src", "dst", root, iters = 3)
    runForget("linkGraph", root, Seq(1L).toDF("vertex"), "vertex")
    assert(graft.pipeline.LinkGraph.edges(spark, root)
      .filter(col("src") === 1L || col("dst") === 1L).count() === 0L)
    val got = graft.pipeline.LinkGraph.levels(spark, root)
      .orderBy("id", "iter").as[(Long, Int, Long)].collect().toSeq
    val expect = graft.operators.Graphs.pageRankLevels(
        Seq(2L -> 3L).toDF("src", "dst"), "src", "dst", 3)
      .orderBy("id", "iter").as[(Long, Int, Long)].collect().toSeq
    assert(got === expect)
  }

  test("parse validation: unknown store and missing keys fail loudly") {
    def parseErr(extra: String): String =
      PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: /tmp/x
           |target.type: parquet
           |target.path: /tmp/y
           |target.mode: overwrite
           |$extra""".stripMargin)
        .fold(e => e.toString, _ => fail("expected a parse error"))
    assert(parseErr(
      """transforms: forget
        |transform.forget.store: bloomIndex
        |transform.forget.root: /tmp/r
        |transform.forget.idColumn: id""".stripMargin).contains("store"))
    assert(parseErr(
      """transforms: forget
        |transform.forget.store: lexIndex
        |transform.forget.idColumn: id""".stripMargin).contains("root"))
  }
}
