package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The shared key-pruned lookup primitive: both pruning layers are
  * advisory — results must equal an unpruned `filter(isin)` against
  * any layout, with or without a stats artifact, stale or fresh.
  */
class KeyedReadsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dir(): String =
    Files.createTempDirectory("keyedreads").resolve("t").toString

  private def table(n: Int): org.apache.spark.sql.DataFrame =
    spark.range(n).select(col("id"), (col("id") * 7 % 100).as("payload"))
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")

  private def expect(d: String, keys: Seq[Long]): Seq[(Long, Long)] =
    spark.read.parquet(d).filter(col("id").isInCollection(keys))
      .as[(Long, Long)].collect().sorted.toSeq

  test("pruned read equals unpruned filter without a stats artifact") {
    val d = dir()
    table(500).write.parquet(d)
    val keys: Seq[Long] = Seq(3L, 77L, 490L, 491L, 9999L)
    val got = KeyedReads.prunedRead(spark, d, "id", keys.toArray[Any])
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === expect(d, keys))
  }

  test("stats artifact prunes the file list but never the result") {
    val d = dir()
    table(1000).write.parquet(d)
    FileStatsIndex.buildAndSave(spark, d, Seq("id"))
    val keys: Seq[Long] = Seq(0L, 1L, 2L, 999L)
    val got = KeyedReads.prunedRead(spark, d, "id", keys.toArray[Any])
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === expect(d, keys))
    // and the planned scan touches fewer files than the table holds:
    // keys 0-2 and 999 live in the two extreme range shards
    val scanned = KeyedReads.prunedRead(spark, d, "id", keys.toArray[Any])
      .select(input_file_name()).distinct().count()
    val all = ParquetSource
      .listParquetFiles(d, spark.sparkContext.hadoopConfiguration).size
    assert(all >= 8 && scanned <= 2, s"scanned $scanned of $all files")
  }

  test("files appended after the stats build are always kept (stale artifact under-prunes only)") {
    val d = dir()
    table(100).write.parquet(d)
    FileStatsIndex.buildAndSave(spark, d, Seq("id"))
    // append rows the artifact has never seen
    spark.range(100, 120).select(col("id"), lit(0L).as("payload"))
      .coalesce(1).write.mode("append").parquet(d)
    spark.catalog.refreshByPath(d)
    val keys: Seq[Long] = Seq(5L, 110L)
    val got = KeyedReads.prunedRead(spark, d, "id", keys.toArray[Any])
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === expect(d, keys))
    assert(got.map(_._1).contains(110L))
  }

  test("string keys and empty key sets behave") {
    val d = dir()
    Seq(("a", 1L), ("m", 2L), ("z", 3L))
      .toDF("id", "payload").repartitionByRange(3, col("id"))
      .sortWithinPartitions("id").write.parquet(d)
    FileStatsIndex.buildAndSave(spark, d, Seq("id"))
    val got = KeyedReads.prunedRead(spark, d, "id", Array[Any]("m", "q"))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("m", 2L)))
    assert(KeyedReads.prunedRead(spark, d, "id", Array.empty[Any]).count() === 0L)
  }

  test("property: random key batches over random layouts match the unpruned filter") {
    val d = dir()
    val rnd = new scala.util.Random(13)
    // scattered non-contiguous ids so file ranges interleave with gaps
    val ids = (0 until 800).map(_ => rnd.nextInt(100000).toLong).distinct
    ids.toDF("id").select(col("id"), (col("id") % 17).as("payload"))
      .repartitionByRange(10, col("id")).sortWithinPartitions("id")
      .write.parquet(d)
    FileStatsIndex.buildAndSave(spark, d, Seq("id"))
    for (_ <- 1 to 5) {
      val keys = (0 until 50).map(_ =>
        if (rnd.nextBoolean()) ids(rnd.nextInt(ids.size))
        else rnd.nextInt(100000).toLong).distinct
      val got = KeyedReads.prunedRead(spark, d, "id", keys.toArray[Any])
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got === expect(d, keys))
    }
  }
}
