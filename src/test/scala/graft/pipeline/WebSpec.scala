package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pipeline/Web: markup extraction, URL canonicalization, line-level
  * dedup/filter. The oracle gates (q_html_extract, q_url_canon,
  * q_line_dedup, q_line_filter) prove DuckDB parity on fixture data;
  * these specs pin the EDGE semantics the fixture never exercises —
  * malformed markup, entity ordering, weird URLs, dedup tie rules.
  */
class WebSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Web.stripMarkup(col("h"))).as[String].head()

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Web.canonicalizeUrl(col("u"))).as[String].head()

  private def host(url: String): String =
    Seq(url).toDF("u").select(Web.urlHost(col("u"))).as[String].head()

  private def domain(h: String): String =
    Seq(h).toDF("h").select(Web.registeredDomain(col("h"))).as[String].head()

  // ---- stripMarkup ----

  test("script/style/comment bodies vanish even when they contain angle brackets and quotes") {
    val h = """<html><script>if (1 < 2) { x = "</b>"; }</script><style>a > b { }</style><!-- <p>hi</p> --><p>Real text</p></html>"""
    assert(strip(h) === "Real text")
  }

  test("block closers and br become line breaks; inline tags become spaces that collapse") {
    val h = "<div>first line</div><p>a <b>bold</b> word</p><br>tail"
    assert(strip(h) === "first line\na bold word\ntail")
  }

  test("entities decode single-pass: &amp;lt; yields literal &lt;") {
    assert(strip("x &amp;lt; y &lt; z &nbsp;&quot;q&quot; &#39;s&#39;") ===
      "x &lt; y < z \"q\" 's'")
  }

  test("malformed markup degrades deterministically: unclosed < survives as text") {
    assert(strip("a < b and <unclosed") === "a < b and <unclosed")
    assert(strip("") === "")
  }

  test("whitespace canonicalization: runs collapse, newline absorbs hugging spaces, ends trim") {
    assert(strip("  <p> a\t\tb </p> <p>  c  </p>  ") === "a b\nc")
  }

  test("markupChars is the exact character delta") {
    val df = Seq("<p>abc</p>").toDF("h")
    assert(df.select(Web.markupChars(col("h"))).as[Long].head() === 7L)
  }

  // ---- canonicalizeUrl / urlHost / registeredDomain ----

  test("tracking params drop from every position; other params keep order") {
    assert(canon("https://h.com/p?utm_source=a&id=1&fbclid=x&r=2") ===
      "https://h.com/p?id=1&r=2")
    assert(canon("https://h.com/p?gclid=x&id=1") === "https://h.com/p?id=1")
    assert(canon("https://h.com/p?utm_a=1&utm_b=2") === "https://h.com/p")
    assert(canon("https://h.com/p?id=1") === "https://h.com/p?id=1")
  }

  test("scheme and authority lowercase; path case preserved; fragment drops") {
    assert(canon("HTTPS://WWW.Ex.COM/CaseSensitive/Path#Frag") ===
      "https://www.ex.com/CaseSensitive/Path")
  }

  test("default ports drop only for the matching scheme; root slash drops") {
    assert(canon("http://h.com:80/") === "http://h.com")
    assert(canon("https://h.com:443/a") === "https://h.com/a")
    assert(canon("http://h.com:443/a") === "http://h.com:443/a")
    assert(canon("https://h.com:8443/a") === "https://h.com:8443/a")
    assert(canon("https://h.com/a/") === "https://h.com/a/")
  }

  test("urlHost strips userinfo, port, www; non-URLs give empty string") {
    assert(host("https://User:pw@WWW.Ex.Co.UK:8080/p?q=1") === "ex.co.uk")
    assert(host("http://plain.org") === "plain.org")
    assert(host("not a url") === "")
  }

  test("registeredDomain: plain TLD, ccTLD extension, bare host") {
    assert(domain("blog.news.example.com") === "example.com")
    assert(domain("www2.bbc.co.uk") === "bbc.co.uk")
    assert(domain("example.org") === "example.org")
    assert(domain("localhost") === "localhost")
    assert(domain("a.co.uk") === "a.co.uk")
  }

  // ---- extractLinks ----

  test("extractLinks pulls quoted hrefs in order, skips href-less anchors") {
    val html = """<a href="u1">x</a><A class=c HREF = "u2">y</A><a name="n">z</a>"""
    val out = Seq(html).toDF("h")
      .select(Web.extractLinks(col("h"))).as[Seq[String]].head()
    assert(out === Seq("u1", "u2"))
  }

  test("extractLinks malformed double-href resolves to the LAST (greedy — matches RE2)") {
    val out = Seq("""<a x href="u1" href="u2">""").toDF("h")
      .select(Web.extractLinks(col("h"))).as[Seq[String]].head()
    assert(out === Seq("u2"))
  }

  test("extractAnchors pairs hrefs with tag-stripped, whitespace-canonical inner text") {
    val html = """<a href="u1">Read <b>more</b>  here</a><a name=x>no</a><A HREF = "u2">  padded </A><a href="u3">unclosed"""
    val out = Seq(html).toDF("h")
      .select(Web.extractAnchors(col("h"))).as[Seq[(String, String)]].head()
    assert(out === Seq(("u1", "Read more here"), ("u2", "padded")))
  }

  // ---- segmentLines / lineDedup / lineQualityFilter ----

  test("segmentLines cuts every k words, remainder stays on the last line") {
    val out = Seq("w1 w2 w3 w4 w5").toDF("t")
      .select(Web.segmentLines(col("t"), 2)).as[String].head()
    assert(out === "w1 w2\nw3 w4\nw5")
    val exact = Seq("w1 w2").toDF("t")
      .select(Web.segmentLines(col("t"), 2)).as[String].head()
    assert(exact === "w1 w2")
  }

  test("lineDedup keeps the first occurrence by (id, line_no) and drops the rest") {
    val df = Seq(
      (1L, "dup line\nunique a"),
      (2L, "dup line\nunique b\ndup line"),
      (3L, "dup line")).toDF("id", "text")
    val out = Web.lineDedup(df, "id", "text").orderBy("id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((1L, "dup line\nunique a", 2L, 0L)))
    assert(out(1) === ((2L, "unique b", 1L, 2L)))
    assert(out(2) === ((3L, "", 0L, 1L)))
  }

  test("lineDedup: short lines are exempt — kept everywhere, never counted") {
    val df = Seq((1L, "x\nbody one"), (2L, "x\nbody two")).toDF("id", "text")
    val out = Web.lineDedup(df, "id", "text", minLineChars = 2).orderBy("id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0)._2 === "x\nbody one" && out(1)._2 === "x\nbody two")
    assert(out.forall(_._4 === 0L))
  }

  test("lineDedup is idempotent") {
    val df = Seq(
      (1L, "dup line\nunique a"),
      (2L, "dup line\nunique b")).toDF("id", "text")
    val once = Web.lineDedup(df, "id", "text").select("id", "text")
    val twice = Web.lineDedup(once, "id", "text").select("id", "text")
    assert(once.orderBy("id").collect().toSeq ===
      twice.orderBy("id").collect().toSeq)
  }

  test("lineDedup conserves line counts: kept + dropped = input lines per doc") {
    val df = Seq((1L, "a b\nc d\na b"), (2L, "a b\ne f")).toDF("id", "text")
    val out = Web.lineDedup(df, "id", "text").orderBy("id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0)._3 + out(0)._4 === 3L)
    assert(out(1)._3 + out(1)._4 === 2L)
  }

  test("lineQualityFilter keeps anchored long-enough lines and drops empty docs") {
    val df = Seq(
      (1L, "the quick brown fox\nshort the\nno anchor words here at all"),
      (2L, "nothing qualifies here")).toDF("id", "text")
    val out = Web.lineQualityFilter(df, "id", "text",
        minTokens = 3, anchorWords = Seq("the"), minKeptLines = 1)
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out.length === 1)
    assert(out(0) === ((1L, "the quick brown fox", 1L, 2L)))
  }

  test("lineQualityFilter tokenizes on spaces ignoring empties (double spaces)") {
    val df = Seq((1L, "the  a  b")).toDF("id", "text")
    val out = Web.lineQualityFilter(df, "id", "text",
        minTokens = 3, anchorWords = Seq("the")).as[(Long, String, Long, Long)].head()
    assert(out === ((1L, "the  a  b", 1L, 0L)))
  }

  // ---- line census (incremental cross-snapshot line dedup) ----

  private def tmpCensus(): String =
    java.nio.file.Files.createTempDirectory("web-census").resolve("c").toString

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").as[(Long, String, Long, Long)].collect().toSeq

  test("probe against a census equals whole-corpus lineDedup on the batch's docs — across an advance") {
    val corpus = Seq((1L, "banner\nbody one"), (2L, "banner\nbody two")).toDF("id", "text")
    val batch1 = Seq((3L, "banner\nbody three\nnewdup"), (4L, "newdup\nbody four")).toDF("id", "text")
    val batch2 = Seq((5L, "newdup\nbanner\nbody five")).toDF("id", "text")
    val dir = tmpCensus()
    Web.createLineCensus(corpus, "id", "text", dir)

    val whole1 = Web.lineDedup(corpus.unionByName(batch1), "id", "text")
      .filter(col("id") >= 3L)
    assert(sorted(Web.lineDedupAgainst(dir, batch1, "id", "text")) === sorted(whole1))

    Web.advanceLineCensus(dir, batch1, "id", "text")
    val whole2 = Web.lineDedup(corpus.unionByName(batch1).unionByName(batch2), "id", "text")
      .filter(col("id") >= 5L)
    assert(sorted(Web.lineDedupAgainst(dir, batch2, "id", "text")) === sorted(whole2))
  }

  test("census keeps the FIRST occurrence authoritative: a batch line never evicts it") {
    val corpus = Seq((10L, "dup here")).toDF("id", "text")
    val dir = tmpCensus()
    Web.createLineCensus(corpus, "id", "text", dir)
    // batch doc 1 has a smaller id than the census's 10 — global first
    // is (1, 0), so the BATCH occurrence survives and 10's is already
    // immortalized (the census is history; only batch rows are output)
    val out = sorted(Web.lineDedupAgainst(dir,
      Seq((1L, "dup here")).toDF("id", "text"), "id", "text"))
    assert(out === Seq((1L, "dup here", 1L, 0L)))
    // and a batch id LARGER than the census first drops its copy
    val out2 = sorted(Web.lineDedupAgainst(dir,
      Seq((20L, "dup here\nmine")).toDF("id", "text"), "id", "text"))
    assert(out2 === Seq((20L, "mine", 1L, 1L)))
  }

  test("probe and advance validate the census's pinned minLineChars sidecar") {
    val dir = tmpCensus()
    Web.createLineCensus(Seq((1L, "abc")).toDF("id", "text"), "id", "text", dir,
      minLineChars = 5)
    // the probe reads eligibility from the sidecar, not the caller:
    // 'abc' (3 chars) is exempt under the census's minLineChars=5
    val out = sorted(Web.lineDedupAgainst(dir,
      Seq((2L, "abc")).toDF("id", "text"), "id", "text"))
    assert(out === Seq((2L, "abc", 1L, 0L)))
    // a missing census fails loudly, never silently passes everything
    val e = intercept[IllegalArgumentException] {
      Web.lineDedupAgainst(tmpCensus(), Seq((1L, "x")).toDF("id", "text"), "id", "text")
    }
    assert(e.getMessage.contains("no line census"))
  }

  test("minorCompactLineCensus folds only the staged deltas; probes identical; base survives by name") {
    val dir = tmpCensus()
    Web.createLineCensus(
      Seq((1L, "banner\nbody one"), (2L, "banner\nbody two")).toDF("id", "text"),
      "id", "text", dir)
    val conf = spark.sparkContext.hadoopConfiguration
    def names() = graft.sources.ParquetSource.listParquetFiles(dir + "/rows", conf)
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    val base = names()
    // two staged epochs SHARE the "newdup" line — its occ contributions
    // sit in two override deltas the fold must aggregate
    Web.advanceStagedLineCensus(
      Seq((3L, "newdup\nbody three")).toDF("id", "text"), "id", "text", dir, "w1")
    Web.advanceStagedLineCensus(
      Seq((4L, "newdup\nbody four")).toDF("id", "text"), "id", "text", dir, "w2")
    val probe = Seq((9L, "banner\nnewdup\nfresh line nine")).toDF("id", "text")
    val pre = sorted(Web.lineDedupAgainst(dir, probe, "id", "text"))
    Web.minorCompactLineCensus(spark, dir)
    val now = names()
    assert(base.subsetOf(now), "a minor fold rewrote base census files")
    assert(!now.exists(n => n.startsWith("part-w1__") || n.startsWith("part-w2__")))
    assert(sorted(Web.lineDedupAgainst(dir, probe, "id", "text")) === pre)
    // the within-subset aggregate really merged: ONE folded row for
    // "newdup" carrying occ 2 and the min locator across both deltas
    val dupHash = Seq("newdup").toDF("l").select(md5(col("l"))).as[String].head()
    val dupRows = spark.read.parquet(dir + "/rows")
      .filter(col("line_hash") === dupHash)
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(dupRows === Seq((dupHash, 2L, 3L, 0)))
  }

  test("advance is exact: occ adds, first takes the global min (census survives a re-read)") {
    val dir = tmpCensus()
    Web.createLineCensus(Seq((5L, "dup here")).toDF("id", "text"), "id", "text", dir)
    Web.advanceLineCensus(dir, Seq((2L, "dup here\nsolo")).toDF("id", "text"), "id", "text")
    val rows = spark.read.parquet(dir + "/rows")
      .as[(String, Long, Long, Int)].collect()
      .map { case (h, o, f, n) => (h, (o, f, n)) }.toMap
    val dupHash = Seq("dup here").toDF("l").select(md5(col("l"))).as[String].head()
    assert(rows(dupHash) === ((2L, 2L, 0)))
  }
}
