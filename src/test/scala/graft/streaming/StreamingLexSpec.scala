package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.LexIndex

/** Streaming lexical ingest end to end: two micro-batches through
  * StreamingLex must leave the index searching exactly like one built
  * over the whole corpus (the per-epoch idempotence itself is pinned
  * in LexIndexSpec — appendEpoch replay).
  */
class StreamingLexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two streamed batches search like a whole-corpus index") {
    val base = Files.createTempDirectory("slex")
    val root = base.resolve("ix").toString
    val srcDir = base.resolve("in").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val b0 = Seq((1L, "spark joins data with spark shuffles"),
      (2L, "window functions rank rows"))
    val b1 = Seq((3L, "spark window spark window"), (4L, "nothing relevant"))
    LexIndex.create(spark.emptyDataset[(Long, String)].toDF("id", "text"),
      "id", "text", root)
    def drop(rows: Seq[(Long, String)], name: String): Unit = {
      val staging = base.resolve("st-" + name).toString
      rows.toDF("id", "text").coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(srcDir, name + ".parquet"))
      ()
    }
    drop(b0, "f0")
    val stream = spark.readStream.schema(b0.toDF("id", "text").schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = StreamingLex.ingestIntoIndex(stream, "id", "text", root,
      base.resolve("ckpt").toString)
    try {
      q.processAllAvailable()
      drop(b1, "f1")
      q.processAllAvailable()
    } finally q.stop()
    val whole = base.resolve("whole").toString
    LexIndex.create((b0 ++ b1).toDF("id", "text"), "id", "text", whole)
    val queries = Seq(("qa", "spark"), ("qa", "window")).toDF("qid", "term")
    def hits(r: String) = LexIndex.search(spark, r, queries, "qid", "term", 10)
      .orderBy("qid", "rank").collect().toSeq
    assert(hits(root) === hits(whole))
  }
}
