package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BlocklistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a classic table scan"),          // "class" must NOT match inside "classic"
    (2L, "the CLASS begins now"),          // case-folded token hit
    (3L, "bad  phrase\nhere"),             // phrase across double space + newline
    (4L, "bad phrases here"),              // "phrase" != "phrases": no phrase hit
    (5L, "class and bad phrase together"), // two distinct terms
    (6L, ""),                              // empty text: zero hits
    (7L, "clean row")
  ).toDF("id", "text")

  private val terms = Seq("class", "bad phrase")

  test("token-boundary, case folding, phrases, and maxTerms") {
    val n = docs.select(col("id"),
        Text.blockedTermCount(col("text"), terms).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 2L, 6L -> 0L, 7L -> 0L))

    assert(Text.blocklistFilter(docs, "text", terms)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 6L, 7L))
    // maxTerms = 1 tolerates a single hit
    assert(Text.blocklistFilter(docs, "text", terms, maxTerms = 1L)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 6L, 7L))
  }

  test("join arm agrees with the expression arm on single-token lists") {
    val single = Seq("class", "row")
    val blocked = single.toDF("term")
    val viaJoin = Text.blocklistFilterJoin(docs, "id", "text", blocked, "term")
      .select("id").as[Long].collect().sorted.toSeq
    val viaExpr = Text.blocklistFilter(docs, "text", single)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaJoin == viaExpr)
    assert(viaJoin == Seq(1L, 3L, 4L, 6L))
  }

  test("config stage reads the wordlist file and filters through Pipeline.transform") {
    val dir = Files.createTempDirectory("graft-blk")
    val wordlist = dir.resolve("bad_words.txt")
    Files.write(wordlist, "class\nbad phrase\n".getBytes("UTF-8"))
    val src = dir.resolve("in").toString
    docs.write.parquet(src)
    val cfg = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: ${dir.resolve("out")}
         |transforms: blocklist
         |transform.blocklist.textColumn: text
         |transform.blocklist.termsPath: $wordlist
         |""".stripMargin).fold(e => fail(s"parse failed: $e"), identity)
    val got = graft.Pipeline.transform(graft.Pipeline.read(spark, cfg), cfg)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 4L, 6L, 7L))
    assert(cfg.transforms.head.check.isEmpty)
    // eager validation
    val bad = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: ${dir.resolve("out2")}
         |transforms: blocklist
         |transform.blocklist.textColumn: text
         |transform.blocklist.termsPath: $wordlist
         |transform.blocklist.maxTerms: -1
         |""".stripMargin)
    assert(bad.swap.exists(_.contains("maxTerms must be >= 0")))
  }
}
