package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TarShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sampleDf(n: Int) = {
    val rows = (1 to n).map { i =>
      val key = f"k$i%04d"
      val payload = Array.tabulate[Byte](100 + (i % 7) * 123)(j => ((i + j) % 251).toByte)
      (key, payload)
    }
    rows.toDF("key", "payload")
  }

  test("round trip: every payload comes back byte-identical, shards stay bounded") {
    val dir = Files.createTempDirectory("graft-tar").toString
    val df = sampleDf(200)
    val manifest = TarShards.write(df, "key", "payload", dir,
      maxShardBytes = 8192, numShards = 4)
    val shards = manifest.collect()
    assert(shards.map(_.getLong(1)).sum == 200L)
    assert(shards.forall(_.getLong(2) <= 8192L))
    // manifest byte counts match the files on disk
    shards.foreach { r =>
      assert(Files.size(Paths.get(dir, r.getString(0))) == r.getLong(2))
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val back = shards.flatMap(r => TarShards.readShard(dir, r.getString(0), conf))
    assert(back.length == 200)
    val expect = sampleDf(200).collect()
      .map(r => (r.getString(0) + ".bin") -> r.getAs[Array[Byte]](1)).toMap
    back.foreach { case (name, payload) =>
      assert(expect(name).sameElements(payload), s"payload mismatch for $name")
    }
    // keys are sorted within each shard (sequential dataloader order)
    shards.foreach { r =>
      val names = TarShards.readShard(dir, r.getString(0), conf).map(_._1)
      assert(names == names.sorted, s"unsorted shard ${r.getString(0)}")
    }
  }

  test("export is byte-deterministic across runs (retry-safe)") {
    val d1 = Files.createTempDirectory("graft-tar-a").toString
    val d2 = Files.createTempDirectory("graft-tar-b").toString
    val m1 = TarShards.write(sampleDf(60), "key", "payload", d1, 4096, 3).collect()
    val m2 = TarShards.write(sampleDf(60), "key", "payload", d2, 4096, 3).collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    m1.foreach { r =>
      val a = Files.readAllBytes(Paths.get(d1, r.getString(0)))
      val b = Files.readAllBytes(Paths.get(d2, r.getString(0)))
      assert(java.util.Arrays.equals(a, b), s"bytes differ for ${r.getString(0)}")
    }
  }

  test("an entry larger than the shard budget still ships, alone") {
    val dir = Files.createTempDirectory("graft-tar-big").toString
    val big = Array.fill[Byte](10000)(7)
    val df = Seq(("a", Array.fill[Byte](10)(1)), ("b", big), ("c", Array.fill[Byte](10)(2)))
      .toDF("key", "payload")
    val manifest = TarShards.write(df, "key", "payload", dir, 4096, 1).collect()
    assert(manifest.map(_.getLong(1)).sum == 3L)
    val conf = spark.sparkContext.hadoopConfiguration
    val all = manifest.flatMap(r => TarShards.readShard(dir, r.getString(0), conf))
    assert(all.find(_._1 == "b.bin").get._2.sameElements(big))
  }

  test("tar-shards config sink: documents export end-to-end with manifest") {
    val dir = Files.createTempDirectory("graft-tar-cfg").toString
    val cfg = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/documents.parquet
         |target.type: tar-shards
         |target.path: $dir
         |target.keyColumn: doc_id
         |target.payloadColumn: text
         |target.maxShardBytes: 65536
         |target.numShards: 4
         |target.suffix: .txt
         |""".stripMargin)
      .fold(e => fail(s"parse failed: $e"), identity)
    val result = graft.Pipeline.run(spark, cfg)
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    assert(result.rowsCopied == docs.count())
    val manifest = spark.read.parquet(s"$dir/_manifest")
    assert(manifest.agg(sum("n_entries")).collect().head.getLong(0) == docs.count())
    // spot-check one payload round-trips the original text
    val conf = spark.sparkContext.hadoopConfiguration
    val firstShard = manifest.orderBy("shard").collect().head.getString(0)
    val entries = TarShards.readShard(dir, firstShard, conf)
    assert(entries.nonEmpty && entries.forall(_._1.endsWith(".txt")))
    val byId = docs.collect().map(r => r.getLong(0).toString -> r.getString(1)).toMap
    entries.take(5).foreach { case (name, payload) =>
      val id = name.stripSuffix(".txt")
      assert(new String(payload, java.nio.charset.StandardCharsets.UTF_8) == byId(id))
    }
  }

  test("tar-shards config validates eagerly") {
    def parseErr(extra: String): String =
      graft.config.PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: ${TestSpark.sf}/documents.parquet
           |$extra""".stripMargin).fold(identity, c => fail(s"expected error, got $c"))
    assert(parseErr(
      """target.type: tar-shards
        |target.path: /tmp/x
        |target.payloadColumn: text
        |""".stripMargin).contains("keyColumn required"))
    assert(parseErr(
      """target.type: tar-shards
        |target.path: /tmp/x
        |target.keyColumn: doc_id
        |target.payloadColumn: text
        |target.maxShardBytes: 100
        |""".stripMargin).contains("maxShardBytes must be >= 1536"))
  }

  test("header validation: empty, oversized names and oversized entries reject") {
    intercept[IllegalArgumentException](TarShards.header("", 0))
    intercept[IllegalArgumentException](TarShards.header("x" * 101, 0))
    intercept[IllegalArgumentException](TarShards.header("ok", -1))
    assert(TarShards.header("ok", 0).length == 512)
  }
}
