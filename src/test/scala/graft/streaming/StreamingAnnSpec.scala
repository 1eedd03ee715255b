package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.pipeline.AnnIndex

class StreamingAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings").cache()

  test("streamed vectors become searchable; restarts do not double-index") {
    val tmp = Files.createTempDirectory("graft-sann")
    val root = tmp.resolve("idx").toString
    val in = tmp.resolve("in").toString
    AnnIndex.build(emb.filter(col("vec_id") < 400), "vec_id", "embedding", root,
      kIvf = 8, m = 16, ksub = 16, iters = 2)
    emb.filter(col("vec_id") >= 400 && col("vec_id") < 450).write.parquet(s"$in/b0")
    val stream = spark.readStream.schema(emb.schema).parquet(s"$in/*")
    val q = StreamingAnn.ingestIntoIndex(stream, "vec_id", "embedding",
      root, tmp.resolve("ck").toString)
    try {
      q.processAllAvailable()
      // batch 1 OVERLAPS batch 0 (a re-delivered snapshot): only the
      // genuinely new rows may append
      emb.filter(col("vec_id") >= 425).write.parquet(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    spark.catalog.refreshByPath(s"$root/index")
    val counts = spark.read.parquet(s"$root/index").groupBy("neighbor_id")
      .count().as[(Long, Long)].collect().toMap
    assert(counts.size.toLong == emb.count() && counts.values.forall(_ == 1L),
      "every vector indexed exactly once across overlapping batches")
    // the streamed-in vectors are genuinely searchable
    val h = AnnIndex.open(spark, root)
    val hits = AnnIndex.search(h, emb.filter(col("vec_id") >= 495),
        "vec_id", "embedding", k = 1, nProbe = 8)
      .select("query_id").as[Long].collect().toSet
    assert(hits == (495L to 499L).toSet, "every appended query answered")
  }

  test("ingest epochs are exactly-once under replay and mid-publish crashes") {
    val tmp = Files.createTempDirectory("graft-sann-eo")
    val root = tmp.resolve("idx").toString
    AnnIndex.build(emb.filter(col("vec_id") < 400), "vec_id", "embedding", root,
      kIvf = 8, m = 16, ksub = 16, iters = 2)
    val h = AnnIndex.open(spark, root)
    def idCounts: Map[Long, Long] = {
      spark.catalog.refreshByPath(h.indexPath)
      spark.read.parquet(h.indexPath).groupBy("neighbor_id").count()
        .as[(Long, Long)].collect().toMap
    }
    val batch0 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    StreamingAnn.processEpoch(batch0, 0, "vec_id", "embedding", h)
    val committed0 = idCounts
    assert(committed0.size == 450 && committed0.values.forall(_ == 1L))
    // a replayed COMMITTED epoch is a no-op (marker short-circuits)
    StreamingAnn.processEpoch(batch0, 0, "vec_id", "embedding", h)
    assert(idCounts == committed0)

    // epoch 1's first attempt died mid-publish: a partial file set
    // under the tag, no marker
    val batch1 = emb.filter(col("vec_id") >= 450)
    val stage = s"$root/_stage/e1"
    batch1.limit(7)
      .select(col("vec_id").as("neighbor_id"),
        graft.pipeline.Ivf.assignment(col("embedding"), h.ivf).as("bucket"),
        graft.pipeline.Pq.encode(col("embedding"), h.pq).as("codes"))
      .write.mode("overwrite").parquet(stage)
    graft.sources.EpochFiles.publish(spark, stage, h.indexPath, "e1")
    assert(idCounts.size > 450) // polluted, as the crash leaves it
    // the replay retires the partial attempt and lands the full batch
    StreamingAnn.processEpoch(batch1, 1, "vec_id", "embedding", h)
    val committed1 = idCounts
    assert(committed1.size.toLong == emb.count() &&
      committed1.values.forall(_ == 1L),
      "every vector indexed exactly once after the retried epoch")
    StreamingAnn.processEpoch(batch1, 1, "vec_id", "embedding", h)
    assert(idCounts == committed1)
  }
}
