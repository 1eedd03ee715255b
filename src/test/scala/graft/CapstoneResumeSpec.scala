package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.config.PipelineConfig

/** The capstone contract: one config-driven LLM-curation pipeline
  * (quality filter → minhash near-dedup → decontaminate → split),
  * savepoints on, KILLED between batches and resumed with
  * `Pipeline.resume` — the resumed output must equal the
  * uninterrupted run's exactly, and the downstream tar export over
  * both outputs must be byte-identical. This is the reference's core
  * promise (resumable config-driven ETL, SavepointsManager) composed
  * with the LLM tier in one artifact.
  */
class CapstoneResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** documents chopped into 4 deterministic single-file chunks so the
    * batch loop has real batches to die between.
    */
  private def choppedSource(base: java.nio.file.Path): String = {
    val dir = base.resolve("src").toString
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    (0 until 4).foreach(i =>
      docs.filter(pmod(col("doc_id"), lit(4)) === i).coalesce(1)
        .write.mode("append").parquet(dir))
    dir
  }

  private def cfgText(src: String, out: String, ref: String, sp: Option[String]) =
    s"""source.type: parquet
       |source.path: $src
       |target.type: parquet
       |target.path: $out
       |target.mode: append
       |${sp.map(d => s"savepoints.dir: $d").getOrElse("")}
       |transforms: qualityFilter, minhashDedup, decontaminate, split
       |transform.qualityFilter.textColumn: text
       |transform.qualityFilter.minScore: 2000
       |transform.minhashDedup.idColumn: doc_id
       |transform.minhashDedup.textColumn: text
       |transform.decontaminate.idColumn: doc_id
       |transform.decontaminate.textColumn: text
       |transform.decontaminate.referencePath: $ref
       |transform.split.keyColumn: doc_id
       |transform.split.fractions: train=95, val=5
       |""".stripMargin

  test("killed-between-batches + resume equals the uninterrupted run; tar export byte-identical") {
    val base = Files.createTempDirectory("graft-capstone")
    val src = choppedSource(base)
    // "benchmark" reference: a handful of real documents -> the
    // decontaminate stage has genuine hits to drop on every run
    val ref = base.resolve("ref").toString
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .filter(pmod(col("doc_id"), lit(97)) === 0).select("text")
      .coalesce(1).write.parquet(ref)

    // uninterrupted run, batch size 1 (4 batches)
    val outA = base.resolve("outA").toString
    val cfgA = PipelineConfig.parse(cfgText(src, outA, ref,
      Some(base.resolve("spA").toString))).fold(e => fail(e), identity)
    val rA = Pipeline.run(spark, cfgA, fileBatchSize = 1)

    // killed run: die right after batch 2's append + savepoint dump
    val outB = base.resolve("outB").toString
    val spB = base.resolve("spB").toString
    val cfgB = PipelineConfig.parse(cfgText(src, outB, ref, Some(spB)))
      .fold(e => fail(e), identity)
    val boom = intercept[RuntimeException](
      Pipeline.run(spark, cfgB, fileBatchSize = 1,
        afterBatch = i => if (i == 2) throw new RuntimeException("kill -9")))
    assert(boom.getMessage == "kill -9")
    // partial state: some rows durable, savepoint records exactly 2 files
    val done = graft.savepoints.SavepointsManager.loadLatest(
      spB, spark.sparkContext.hadoopConfiguration)
    assert(done.size == 2)
    val partial = spark.read.parquet(outB).count()
    assert(partial > 0 && partial < rA.rowsCopied)

    // resume: one call, finishes the remaining batches
    val rB = Pipeline.resume(spark, cfgB, fileBatchSize = 1)
    assert(rB.filesCompleted.size == 2) // only the 2 remaining files ran

    val rowsA = spark.read.parquet(outA).collect()
      .map(_.toSeq.map(String.valueOf).mkString("")).sorted.toSeq
    val rowsB = spark.read.parquet(outB).collect()
      .map(_.toSeq.map(String.valueOf).mkString("")).sorted.toSeq
    assert(rowsA == rowsB, "resumed output differs from the uninterrupted run")
    assert(rowsA.nonEmpty && rowsA.size.toLong == rA.rowsCopied)

    // the curation actually curated: some rows were dropped along the way
    val srcCount = spark.read.parquet(src).count()
    assert(rA.rowsCopied < srcCount)

    // downstream tar export over both outputs is byte-identical
    def tarDigest(outDir: String, tarBase: java.nio.file.Path): Seq[String] = {
      val c = PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: $outDir
           |target.type: tar-shards
           |target.path: $tarBase
           |target.keyColumn: doc_id
           |target.payloadColumn: text
           |target.numShards: 2
           |""".stripMargin).fold(e => fail(e), identity)
      Pipeline.run(spark, c)
      val files = java.nio.file.Files.list(tarBase).iterator()
      val md = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
        .filter(_.toString.endsWith(".tar")).toSeq.sortBy(_.toString)
        .map { p =>
          val d = java.security.MessageDigest.getInstance("MD5")
          p.getFileName.toString + ":" +
            d.digest(java.nio.file.Files.readAllBytes(p))
              .map("%02x".format(_)).mkString
        }
      assert(md.nonEmpty)
      md
    }
    val tA = tarDigest(outA, Files.createDirectories(base.resolve("tarA")))
    val tB = tarDigest(outB, Files.createDirectories(base.resolve("tarB")))
    assert(tA == tB, "tar shards from the resumed pipeline differ byte-for-byte")
  }

  test("resume without a savepoints dir is rejected; resume after completion is a no-op") {
    val base = Files.createTempDirectory("graft-capstone2")
    val src = choppedSource(base)
    val out = base.resolve("out").toString
    val sp = base.resolve("sp").toString
    val noSp = PipelineConfig.parse(cfgText(src, out, out, None))
      .fold(e => fail(e), identity)
    intercept[IllegalArgumentException](Pipeline.resume(spark, noSp))
    // a clean full run, then resume: nothing left to do, target unchanged
    val ref = base.resolve("ref").toString
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .limit(5).select("text").coalesce(1).write.parquet(ref)
    val cfg = PipelineConfig.parse(cfgText(src, out, ref, Some(sp)))
      .fold(e => fail(e), identity)
    val r1 = Pipeline.run(spark, cfg, fileBatchSize = 2)
    val before = spark.read.parquet(out).count()
    val r2 = Pipeline.resume(spark, cfg)
    assert(r2.rowsCopied == 0 && r2.filesCompleted.isEmpty)
    assert(spark.read.parquet(out).count() == before && before == r1.rowsCopied)
  }
}
