package graft.config

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Pipeline, TestSpark}

/** Config surface of the pipeline/Web tier: htmlExtract, urlCanon,
  * lineDedup, lineFilter. Stage output must equal the direct Scala
  * calls (the q_cfg_attribution invariant) and honor the re-attach
  * contract (schema preserved, multiplicity preserved, null ids kept).
  */
class WebStagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(extra: String): PipelineConfig = {
    val out = Files.createTempDirectory("graft-web").resolve("out").toString
    PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/documents.parquet
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |$extra""".stripMargin)
      .fold(e => fail(s"parse failed: $e"), identity)
  }

  test("eager validation: bad lineDedup / lineFilter configs fail at load") {
    def bad(extra: String): String =
      PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: x
           |target.type: parquet
           |target.path: y
           |target.mode: overwrite
           |$extra""".stripMargin).left.getOrElse(fail("expected parse error"))
    assert(bad(
      """transforms: lineDedup
        |transform.lineDedup.idColumn: doc_id
        |transform.lineDedup.textColumn: text
        |transform.lineDedup.minDupCount: 1
        |""".stripMargin).contains("minDupCount"))
    assert(bad(
      """transforms: lineFilter
        |transform.lineFilter.idColumn: doc_id
        |transform.lineFilter.textColumn: text
        |transform.lineFilter.minTokens: 2
        |""".stripMargin).contains("anchorWords"))
    assert(bad(
      """transforms: htmlExtract
        |""".stripMargin).contains("textColumn"))
  }

  test("lineDedup stage equals the direct call and preserves schema + extra columns") {
    val c = parse(
      """transforms: lineDedup
        |transform.lineDedup.idColumn: doc_id
        |transform.lineDedup.textColumn: text
        |transform.lineDedup.segmentWords: 6
        |""".stripMargin)
    val docs = Pipeline.read(spark, c)
    val got = Pipeline.transform(docs, c)
    assert(got.columns.toSeq == docs.columns.toSeq)
    assert(got.count() == docs.count()) // lineDedup never drops documents
    val seg = docs.withColumn("text", graft.pipeline.Web.segmentLines(col("text"), 6))
    val direct = graft.pipeline.Web.lineDedup(
        seg.select(col("doc_id"), col("text")), "doc_id", "text")
      .select(col("doc_id"), col("text"))
    assert(got.select("doc_id", "text").except(direct).isEmpty)
    assert(direct.except(got.select("doc_id", "text")).isEmpty)
  }

  test("lineFilter stage drops disqualified docs and rewrites text in place") {
    val c = parse(
      """transforms: lineFilter
        |transform.lineFilter.idColumn: doc_id
        |transform.lineFilter.textColumn: text
        |transform.lineFilter.minTokens: 4
        |transform.lineFilter.anchorWords: a, the
        |transform.lineFilter.segmentWords: 8
        |""".stripMargin)
    val docs = Pipeline.read(spark, c)
    val got = Pipeline.transform(docs, c)
    assert(got.columns.toSeq == docs.columns.toSeq)
    val direct = graft.pipeline.Web.lineQualityFilter(
      docs.withColumn("text", graft.pipeline.Web.segmentLines(col("text"), 8))
        .select(col("doc_id"), col("text")),
      "doc_id", "text", minTokens = 4, anchorWords = Seq("a", "the"))
    assert(got.count() == direct.count())
    assert(got.select("doc_id", "text")
      .except(direct.select(col("doc_id"), col("text"))).isEmpty)
  }

  test("urlCanon stage: in-place canon plus derived host/domain columns") {
    val base = Files.createTempDirectory("graft-webu")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    Seq(
      (1L, "HTTPS://WWW.News.Example.CO.UK:443/A?utm_source=x&id=1#f"),
      (2L, "http://blog.other.org/p?gclid=g"))
      .toDF("id", "url").write.parquet(src)
    val c = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |transforms: urlCanon
         |transform.urlCanon.urlColumn: url
         |transform.urlCanon.hostColumn: host
         |transform.urlCanon.domainColumn: domain
         |""".stripMargin).fold(e => fail(e), identity)
    Pipeline.run(spark, c)
    val got = spark.read.parquet(out).orderBy("id")
      .as[(Long, String, String, String)].collect()
    assert(got(0) === ((1L, "https://www.news.example.co.uk/A?id=1",
      "news.example.co.uk", "example.co.uk")))
    assert(got(1) === ((2L, "http://blog.other.org/p", "blog.other.org", "other.org")))
  }

  test("htmlExtract stage strips markup in place") {
    val base = Files.createTempDirectory("graft-webh")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    Seq((1L, "<p>keep me</p><script>drop()</script>"))
      .toDF("id", "page").write.parquet(src)
    val c = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |transforms: htmlExtract
         |transform.htmlExtract.textColumn: page
         |""".stripMargin).fold(e => fail(e), identity)
    Pipeline.run(spark, c)
    assert(spark.read.parquet(out).as[(Long, String)].head() === ((1L, "keep me")))
  }

  test("lineDedup stage with censusDir: two snapshot runs equal the whole-corpus result") {
    import org.apache.spark.sql.DataFrame
    val base = Files.createTempDirectory("graft-webc")
    val census = base.resolve("census").toString
    def run(snap: DataFrame, tag: String, advance: Boolean): DataFrame = {
      val src = base.resolve(s"src-$tag").toString
      val out = base.resolve(s"out-$tag").toString
      snap.write.parquet(src)
      val c = PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: $src
           |target.type: parquet
           |target.path: $out
           |target.mode: overwrite
           |transforms: lineDedup
           |transform.lineDedup.idColumn: id
           |transform.lineDedup.textColumn: text
           |transform.lineDedup.censusDir: $census
           |transform.lineDedup.advance: $advance
           |""".stripMargin).fold(e => fail(e), identity)
      Pipeline.run(spark, c)
      spark.read.parquet(out)
    }
    val snap1 = Seq((1L, "banner\nbody one"), (2L, "banner\nbody two")).toDF("id", "text")
    val snap2 = Seq((3L, "banner\nbody three\nfresh"), (4L, "fresh\nbody four")).toDF("id", "text")
    graft.pipeline.Web.createLineCensus(
      spark.emptyDataset[(Long, String)].toDF("id", "text"), "id", "text", census)
    val got1 = run(snap1, "s1", advance = true)
    // empty census: snapshot 1 dedups only against itself
    assert(got1.orderBy("id").select("text").as[String].collect().toSeq ===
      Seq("banner\nbody one", "body two"))
    val got2 = run(snap2, "s2", advance = true)
    val whole = graft.pipeline.Web.lineDedup(snap1.unionByName(snap2), "id", "text")
      .filter(col("id") >= 3L).select(col("id"), col("text"))
    assert(got2.select("id", "text").except(whole).isEmpty)
    assert(whole.except(got2.select("id", "text")).isEmpty)
    // eager validation: advance without a census dir is rejected
    assert(PipelineConfig.parse(
      """source.type: parquet
        |source.path: x
        |target.type: parquet
        |target.path: y
        |target.mode: overwrite
        |transforms: lineDedup
        |transform.lineDedup.idColumn: id
        |transform.lineDedup.textColumn: text
        |transform.lineDedup.advance: true
        |""".stripMargin).left.exists(_.contains("censusDir")))
    // and an explicit minLineChars alongside a census is a silently
    // ignored knob — rejected at parse, not at runtime
    assert(PipelineConfig.parse(
      """source.type: parquet
        |source.path: x
        |target.type: parquet
        |target.path: y
        |target.mode: overwrite
        |transforms: lineDedup
        |transform.lineDedup.idColumn: id
        |transform.lineDedup.textColumn: text
        |transform.lineDedup.censusDir: /tmp/c
        |transform.lineDedup.minLineChars: 3
        |""".stripMargin).left.exists(_.contains("pinned by the census")))
  }

  test("lineDedup advanceTag: re-running the same config is end-state idempotent") {
    import org.apache.spark.sql.DataFrame
    val base = Files.createTempDirectory("graft-webtag")
    val census = base.resolve("census").toString
    val snapA = Seq((1L, "banner\nbody one"), (2L, "banner\nbody two")).toDF("id", "text")
    val snapB = Seq((3L, "banner\nbody three")).toDF("id", "text")
    graft.pipeline.Web.createLineCensus(snapA, "id", "text", census)
    val src = base.resolve("srcB").toString
    val out = base.resolve("outB").toString
    snapB.write.parquet(src)
    val cfgText =
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |transforms: lineDedup
         |transform.lineDedup.idColumn: id
         |transform.lineDedup.textColumn: text
         |transform.lineDedup.censusDir: $census
         |transform.lineDedup.advance: true
         |transform.lineDedup.advanceTag: epochB
         |""".stripMargin
    val cfg = PipelineConfig.parse(cfgText).fold(e => fail(e), identity)
    def censusState(): Seq[(String, Long)] = {
      spark.catalog.refreshByPath(census + "/rows")
      spark.read.parquet(census + "/rows")
        .groupBy("line_hash").agg(sum("occ").as("occ"))
        .as[(String, Long)].collect().sorted.toSeq
    }
    Pipeline.run(spark, cfg)
    val out1 = spark.read.parquet(out).orderBy("id")
      .select("id", "text").as[(Long, String)].collect().toSeq
    val census1 = censusState()
    // replay the SAME config (a failed-run retry): the tag retires its
    // previous delta, the probe sees the pre-epoch census, and the
    // republished state is identical — counts do NOT fold twice
    Pipeline.run(spark, cfg)
    assert(spark.read.parquet(out).orderBy("id")
      .select("id", "text").as[(Long, String)].collect().toSeq === out1)
    assert(censusState() === census1)
    // the banner was already census-duplicated, so the batch row drops it
    assert(out1 === Seq((3L, "body three")))
    // eager validation: advanceTag without advance is rejected
    assert(PipelineConfig.parse(cfgText.replace("transform.lineDedup.advance: true\n", ""))
      .left.exists(_.contains("advanceTag")))
  }

  test("lineDedup stage re-attach: null ids and duplicate ids survive untouched") {
    val base = Files.createTempDirectory("graft-webn")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    Seq((Some(1L), "dup line\nmine"), (Some(1L), "dup line\nmine"),
        (None, "dup line\nother"))
      .toDF("id", "text").write.parquet(src)
    val c = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |transforms: lineDedup
         |transform.lineDedup.idColumn: id
         |transform.lineDedup.textColumn: text
         |""".stripMargin).fold(e => fail(e), identity)
    Pipeline.run(spark, c)
    val got = spark.read.parquet(out)
    assert(got.count() === 3) // multiplicity preserved
    // the null-id row keeps its original text (lineDedup ignores null
    // ids, and the re-attach join can never match them)
    assert(got.filter(col("id").isNull).select("text").as[String].head()
      === "dup line\nother")
    // duplicate id=1 rows MERGE for counting and reassembly (ids are
    // expected unique; the deterministic degradation is both copies'
    // lines interleaving, line_no-sorted, in both surviving rows)
    assert(got.filter(col("id") === 1L).select("text").as[String].collect()
      .toSeq === Seq("dup line\ndup line\nmine\nmine",
        "dup line\ndup line\nmine\nmine"))
  }
}
