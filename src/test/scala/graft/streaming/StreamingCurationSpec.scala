package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The stateless curation stages (normalize, quality filter, PII scrub)
  * are pure scan-side plans, so the SAME config stages that curate a
  * batch corpus run unchanged inside a Structured Streaming query — no
  * separate streaming implementation to keep in sync. (Stateful stages
  * — dedup, budget, mixture — have their own streaming tier:
  * StreamingDedup / watermarked windows.)
  */
class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("config-driven stateless curation runs on a stream, batch-identical") {
    val dir = Files.createTempDirectory("graft-stream-cur")
    val srcDir = dir.resolve("in").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val docs = Seq(
      """{"doc_id": 1, "text": "the  Cat sat on the mat with a hat and a bat"}""",
      """{"doc_id": 2, "text": "000000 111111 222222 333333"}""",
      """{"doc_id": 3, "text": "reach me at a.b@example.com or 123456789012"}""",
      """{"doc_id": 4, "text": ""}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "part-0.json"),
      docs.mkString("\n").getBytes("UTF-8"))

    val cfg = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: unused
         |target.type: parquet
         |target.path: ${dir.resolve("out")}
         |transforms: normalize, piiScrub, qualityFilter, gopherFilter
         |transform.normalize.textColumn: text
         |transform.piiScrub.textColumn: text
         |transform.qualityFilter.textColumn: text
         |transform.qualityFilter.minScore: 3500
         |transform.gopherFilter.textColumn: text
         |transform.gopherFilter.minWords: 3
         |transform.gopherFilter.minMeanLen: 2
         |transform.gopherFilter.minStopHits: 1
         |transform.gopherFilter.maxTopTokenPct: 40
         |""".stripMargin)
      .fold(e => fail(s"parse failed: $e"), identity)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).json(srcDir)
    val curated = graft.Pipeline.transform(stream, cfg)
    assert(curated.isStreaming, "stages must not force a batch plan")

    val q = curated.writeStream.format("memory").queryName("stream_curation")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_curation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // batch reference: the same config over the same rows
    val batch = spark.read.schema(schema).json(srcDir)
    val expect = graft.Pipeline.transform(batch, cfg).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expect && got.nonEmpty)
    // normalize lowercased, PII scrubbed, junk dropped
    assert(got.keySet.contains(1L) && !got.keySet.contains(2L) && !got.keySet.contains(4L))
    got.get(3L).foreach { t =>
      assert(t.contains("<EMAIL>") && t.contains("<NUMBER>") &&
        !t.contains("example.com") && !t.contains("123456789012"))
    }
  }

  test("pplAssignStatic curates a stream with a batch-trained model, batch-identical") {
    import graft.pipeline.Text
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    // train once on the batch corpus: vocab + per-language cutoffs
    val model = Text.termStats(docs, "text", "doc_id")
    val vocab = Text.vocabMap(model, maxVocab = 1 << 20)
    val cuts = Text.pplCutoffMap(docs, "text", "doc_id", "lang", model)

    val dir = Files.createTempDirectory("graft-stream-ppl")
    val srcDir = dir.resolve("in").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    // the "stream" replays the corpus as JSONL
    val rows = docs.select("doc_id", "text", "lang").collect().map { r =>
      val quoted = Option(r.getString(1)).getOrElse("")
        .replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t")
      s"""{"doc_id": ${r.getLong(0)}, "text": "$quoted", "lang": "${r.getString(2)}"}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "part-0.json"),
      rows.mkString("\n").getBytes("UTF-8"))

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val stream = spark.readStream.schema(schema).json(srcDir)
    val assigned = Text.pplAssignStatic(stream, "text", "doc_id", "lang", vocab, cuts)
    assert(assigned.isStreaming, "static assignment must not force a batch plan")

    val q = assigned.writeStream.format("memory").queryName("stream_ppl")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_ppl").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap

    val expect = Text.pplAssignStatic(
        spark.read.schema(schema).json(srcDir), "text", "doc_id", "lang", vocab, cuts)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect && got.nonEmpty)
  }
}
