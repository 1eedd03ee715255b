package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.LinkGraph

/** Streaming link-graph ingest end to end: two micro-batches of crawl
  * edges through StreamingGraph must leave the store serving exactly
  * the whole-graph recurrence over everything streamed (per-epoch
  * replay idempotence itself is pinned in LinkGraphSpec).
  */
class StreamingGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two streamed edge batches rank like a store built over the union") {
    val base = Files.createTempDirectory("sgraph")
    val root = base.resolve("g").toString
    val srcDir = base.resolve("in").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val b0 = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val b1 = Seq(2L -> 4L, 4L -> 1L, 5L -> 2L, 3L -> 1L) // one dup
    LinkGraph.create(spark.emptyDataset[(Long, Long)].toDF("src", "dst"),
      "src", "dst", root, iters = 3)
    def drop(rows: Seq[(Long, Long)], name: String): Unit = {
      val staging = base.resolve("st-" + name).toString
      rows.toDF("src", "dst").coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(srcDir, name + ".parquet"))
      ()
    }
    drop(b0, "f0")
    val stream = spark.readStream.schema(b0.toDF("src", "dst").schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = StreamingGraph.ingestIntoGraph(stream, "src", "dst", root,
      base.resolve("ckpt").toString)
    try {
      q.processAllAvailable()
      drop(b1, "f1")
      q.processAllAvailable()
    } finally q.stop()
    val whole = base.resolve("whole").toString
    LinkGraph.create((b0 ++ b1).toDF("src", "dst"), "src", "dst", whole, iters = 3)
    def lv(r: String) = LinkGraph.levels(spark, r)
      .orderBy("id", "iter").as[(Long, Int, Long)].collect().toSeq
    assert(lv(root) === lv(whole))
  }
}
