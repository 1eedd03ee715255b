package graft.config

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Pipeline, TestSpark}

class TransformStagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cfg(extra: String): PipelineConfig = {
    val out = Files.createTempDirectory("graft-tf").resolve("out").toString
    PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/documents.parquet
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |$extra""".stripMargin)
      .fold(e => fail(s"parse failed: $e"), identity)
  }

  test("full curation chain from config: dedup -> cap -> split") {
    val c = cfg(
      """transforms: dedupExact, sourceCap, split
        |transform.dedupExact.idColumn: doc_id
        |transform.dedupExact.textColumn: text
        |transform.sourceCap.groupColumns: source
        |transform.sourceCap.idColumn: doc_id
        |transform.sourceCap.textColumn: text
        |transform.sourceCap.k: 10
        |transform.split.keyColumn: doc_id
        |transform.split.fractions: train=90, val=10
        |transform.split.denom: 100
        |""".stripMargin)
    assert(c.transforms.map(_.name) == List("dedupExact", "sourceCap", "split"))
    val result = Pipeline.run(spark, c)
    val out = spark.read.parquet(c.target.asInstanceOf[TargetConfig.Parquet].path)
    assert(out.columns.contains("split"))
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.nonEmpty && perSource.forall(_.getLong(1) <= 10))
    assert(out.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val")))
    assert(result.rowsCopied == out.count())
    // stages also surface in the redacted render
    assert(c.renderRedacted.contains("dedupExact,sourceCap,split"))
  }

  test("dedupExact keeps the min id per distinct text") {
    val c = cfg(
      """transforms: dedupExact
        |transform.dedupExact.idColumn: doc_id
        |transform.dedupExact.textColumn: text
        |""".stripMargin)
    val got = Pipeline.transform(Pipeline.read(spark, c), c)
    val expect = graft.Tables.load(spark, TestSpark.sf, "documents")
      .groupBy("text").agg(min("doc_id").as("doc_id"))
    assert(got.count() == expect.count())
    assert(got.join(expect, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("normalize and spanDedup stages compose on the input schema") {
    import spark.implicits._
    // normalize: damage the text, then the stage must canonicalize it
    val c1 = cfg(
      """transforms: normalize
        |transform.normalize.textColumn: text
        |""".stripMargin)
    val dirty = Seq((1L, "  A   B "), (2L, "ok")).toDF("doc_id", "text")
    val cleaned = Pipeline.transform(dirty, c1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned == Map(1L -> "a b", 2L -> "ok"))

    // spanDedup: text column replaced by the cleaned text, other
    // columns intact, schema unchanged
    val c2 = cfg(
      """transforms: spanDedup
        |transform.spanDedup.idColumn: doc_id
        |transform.spanDedup.textColumn: text
        |transform.spanDedup.spanTokens: 3
        |transform.spanDedup.minDocs: 2
        |""".stripMargin)
    val docs = Seq(
      (1L, "alpha beta gamma the same footer", "s1"),
      (2L, "delta echo foxtrot the same footer", "s2")).toDF("doc_id", "text", "source")
    val out = Pipeline.transform(docs, c2)
    assert(out.columns.sorted.toSeq == Seq("doc_id", "source", "text"))
    val m = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("text"), r.getAs[String]("source"))).toMap
    assert(m(1L) == (("alpha beta gamma", "s1")))
    assert(m(2L) == (("delta echo foxtrot", "s2")))
    // eager validation
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |transforms: spanDedup
         |transform.spanDedup.idColumn: doc_id
         |transform.spanDedup.textColumn: text
         |transform.spanDedup.minDocs: 1
         |""".stripMargin).swap.exists(_.contains("minDocs")))
  }

  test("config errors are eager: unknown stage, missing key, bad fractions") {
    def parseErr(extra: String): String =
      PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: x
           |target.type: parquet
           |target.path: y
           |$extra""".stripMargin).swap.getOrElse(fail("expected a parse error"))
    assert(parseErr("transforms: vacuum\n").contains("unknown transform stage"))
    assert(parseErr("transforms: dedupExact\n")
      .contains("transform.dedupExact.idColumn required"))
    assert(parseErr(
      """transforms: split
        |transform.split.keyColumn: doc_id
        |transform.split.fractions: train=60, val=60
        |""".stripMargin).contains("fit in denom"))
    assert(parseErr(
      """transforms: sourceCap
        |transform.sourceCap.idColumn: doc_id
        |transform.sourceCap.textColumn: text
        |transform.sourceCap.k: 0
        |""".stripMargin).contains("k must be positive"))
    // stream + transforms cannot combine
    assert(parseErr(
      """transforms: split
        |transform.split.keyColumn: doc_id
        |transform.split.fractions: train=100
        |stream.changesDir: /tmp/c
        |stream.checkpointDir: /tmp/k
        |stream.primaryKey: pk
        |stream.orderBy: ts
        |""".stripMargin).contains("batch copies"))
  }
}
