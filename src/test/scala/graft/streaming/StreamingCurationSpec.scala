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
         |transforms: normalize, piiScrub, qualityFilter
         |transform.normalize.textColumn: text
         |transform.piiScrub.textColumn: text
         |transform.qualityFilter.textColumn: text
         |transform.qualityFilter.minScore: 3500
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
}
