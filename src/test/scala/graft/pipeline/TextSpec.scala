package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunks: overlap, short-doc single chunk, and empty text") {
    val df = Seq(
      ((1 to 10).map(i => s"t$i").mkString(" "), "ten"),
      ("a b", "short"),
      ("", "empty")).toDF("text", "tag")
    val got = df.select(col("tag"), Text.chunks("text", 4, 2).as("ch"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // size=4, overlap=2, step=2: 10 tokens -> ceil((10-2)/2)=4 chunks,
    // consecutive chunks share 2 tokens
    assert(got("ten") == Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(got("short") == Seq("a b")) // shorter than one chunk
    assert(got("empty") == Seq(""))    // empty doc keeps one (empty) row
  }

  test("chunks rejects overlap >= size") {
    intercept[IllegalArgumentException](Text.chunks("text", 4, 4))
  }

  test("tokens handles empties, padding and repeated whitespace") {
    val df = Seq("", "  ", "one", " a  b\t c ").toDF("text")
    val got = df.select(Text.tokenCount(col("text")).as("n")).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 1, 3))
  }

  test("quality metrics are exact integers") {
    val df = Seq((1L, "Hello, world! 123 the end.")).toDF("doc_id", "text")
    val r = Text.qualityMetrics(df, "text", "doc_id").collect().head
    assert(r.getLong(1) == 26)  // n_chars
    assert(r.getLong(2) == 5)   // [Hello,][world!][123][the][end.]
    assert(r.getLong(3) == 22)  // token chars: 6+6+3+3+4
    assert(r.getLong(4) == 3)   // , ! .
    assert(r.getLong(5) == 3)   // 1 2 3
    assert(r.getLong(6) == 1)   // "the"
  }

  test("language id votes deterministically with lexical tie-break") {
    val df = Seq(
      (1L, "der hund und die katze ist nicht hier"),
      (2L, "el perro es un animal en la casa"),
      (3L, "xyzzy qwerty")).toDF("doc_id", "text")
    val got = Text.langId(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(got(1L) == "de")
    assert(got(2L) == "es")
    assert(got(3L) == "und")
  }

  test("winnowing fingerprints: identical texts share all, disjoint texts none") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "zz yy xx ww vv uu tt ss rr qq pp")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), Text.fingerprintExpr("text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L))
    assert((fps(1L) & fps(3L)).isEmpty)
    assert(fps(1L).nonEmpty)
  }

  test("portable fingerprint matches the xxhash variant's set structure") {
    val df = Seq((1L, "aa bb cc dd ee ff gg hh"), (2L, "aa bb cc dd ee ff gg hh"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), Text.fingerprintPortableExpr("text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fps(1L) == fps(2L) && fps(1L).nonEmpty)
    assert(fps(1L) == fps(1L).distinct.sorted) // distinct + sorted contract
  }

  test("tf-idf: corpus-wide terms score zero, rare terms score higher") {
    val df = Seq((1L, "common rare1"), (2L, "common rare2"), (3L, "common rare3"))
      .toDF("doc_id", "text")
    val scores = Text.tfIdf(df, "text", "doc_id").select("term", "tf_idf")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("common") == 0.0) // df == N -> ln(1) = 0
    assert(scores("rare1") > 0.0)
    val stats = Text.termStats(df, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.find(_._1 == "common").contains(("common", 3L, 3L)))
  }

  test("subword count grows with word length") {
    val df = Seq(("short words here", "anextraordinarilylongcompoundword here")).toDF("a", "b")
    val r = df.select(Text.subwordCount(col("a")).as("x"), Text.subwordCount(col("b")).as("y"))
      .collect().head
    assert(r.getLong(0) == 3)
    assert(r.getLong(1) > 2) // long word contributes extra subword units
  }

  test("normalize: case, control chars, whitespace runs, idempotence") {
    val df = Seq(
      "Hello   WORLD",
      "tab\therectrl",
      " padded  ",
      "already clean",
      "").toDF("text")
    val got = df.select(Text.normalize(col("text")).as("n")).as[String].collect().toSeq
    assert(got == Seq("hello world", "tab here ctrl", "padded", "already clean", ""))
    // idempotent: normalizing a normalized text is a no-op
    val twice = df.select(Text.normalize(Text.normalize(col("text"))).as("n"))
      .as[String].collect().toSeq
    assert(twice == got)
  }

  test("bm25: idf ranks selective terms above ubiquitous ones; dl normalizes") {
    // 'rare' appears in 1 of 4 docs, 'common' in all 4: a doc matching
    // only 'rare' must outrank one matching only 'common' at equal tf/dl
    val df = Seq(
      (1L, "rare alpha beta gamma"),
      (2L, "common alpha beta gamma"),
      (3L, "common delta epsilon zeta"),
      (4L, "common eta theta iota")).toDF("doc_id", "text")
    val r = Text.bm25(df, "text", "doc_id", Seq("rare", "common"))
      .collect().map(x => x.getLong(0) -> (x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L)._1 == 1L && r(2L)._1 == 1L)
    assert(r(1L)._2 > r(2L)._2, s"rare-term doc must outrank: $r")
    // longer doc with same tf scores lower (dl normalization)
    val dl = Seq((1L, "q a b c"), (2L, "q a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val s = Text.bm25(dl, "text", "doc_id", Seq("q"))
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(s(1L) > s(2L))
    // score is the textbook formula, checked to double precision
    val one = Text.bm25(Seq((1L, "q x"), (2L, "y z")).toDF("doc_id", "text"),
      "text", "doc_id", Seq("q")).collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    val idf = math.log(1.0 + (2.0 - 1.0 + 0.5) / (1.0 + 0.5))
    val expected = idf * 1.0 * 2.2 / (1.0 + 1.2 * (0.25 + (0.75 * 2) / 2.0))
    assert(math.abs(one(1L) - expected) < 1e-15 && one(2L) == 0.0)
  }

  test("bm25 rejects empty and oversized query sets") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Text.bm25(df, "text", "doc_id", Nil))
    intercept[IllegalArgumentException](
      Text.bm25(df, "text", "doc_id", (1 to 65).map(_.toString)))
  }

  test("bigrams: empty and one-token documents yield empty arrays, not errors") {
    // regression: sequence(1, 0) is a DESCENDING [1, 0] in Spark and
    // element_at(ts, 0) throws — short docs must take the explicit arm
    val df = Seq("", "solo", "two tokens", "a b c").toDF("text")
    val got = df.select(Text.bigrams("text").as("b"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got == Seq(Seq(), Seq(), Seq("two tokens"), Seq("a b", "b c")))
    // bigramStats over a corpus containing short docs must not abort
    val docs = Seq((1L, "a b a"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val stats = Text.bigramStats(docs, "text", "doc_id",
        Text.bigramModel(docs, "text"), minCount = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats == Map(1L -> 2L)) // docs 2/3 have no bigrams -> no row
  }

  test("unigramStats: oov counting, model sums, external model with misses") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // self-model: counts a=2, b=2, c=1; minCount=2 makes c OOV
    val self = Text.unigramStats(docs, "text", "doc_id",
        Text.termStats(docs, "text", "doc_id"), minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(self(1L) == ((3L, 0L, 6L, 3 * math.log(2.0))))       // a,a,b -> 2+2+2
    assert(self(2L)._1 == 2L && self(2L)._2 == 1L && self(2L)._3 == 3L) // b=2, c oov
    assert(math.abs(self(2L)._4 - math.log(2.0)) < 1e-15)       // only b in-vocab
    // external model missing a term entirely: the miss counts as OOV, sums 0
    val model = Seq(("a", 5L)).toDF("term", "term_freq_total")
    val ext = Text.unigramStats(docs, "text", "doc_id", model, minCount = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(ext(1L) == ((1L, 10L))) // b unseen -> oov, contributes 0
    assert(ext(2L) == ((2L, 0L)))  // b and c both unseen
  }

  test("retrievalTopK ranks by integer evidence with exact tiebreaks") {
    val docs = Seq(
      (1L, "x x y"),      // q0: matches x(2) and y(1) -> n_matched 2, sum_tf 3
      (2L, "x y z"),      // q0: n_matched 2, sum_tf 2
      (3L, "x x x x"),    // q0: n_matched 1, sum_tf 4 — fewer distinct terms ranks BELOW both
      (4L, "z z z"),      // q0: no match; q1: z -> tf 3
      (5L, "w")).toDF("doc_id", "text")
    val queries = Seq(("q0", "x"), ("q0", "y"), ("q1", "z")).toDF("qid", "term")
    val got = Text.retrievalTopK(docs, "text", "doc_id", queries, "qid", "term", k = 3)
      .select("qid", "rank", "doc_id", "n_matched", "sum_tf", "dl")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      ("q0", 1L, 1L, 2L, 3L, 3L),
      ("q0", 2L, 2L, 2L, 2L, 3L),
      ("q0", 3L, 3L, 1L, 4L, 4L),
      ("q1", 1L, 4L, 1L, 3L, 3L),
      ("q1", 2L, 2L, 1L, 1L, 3L)))  // doc 2 "x y z" carries one z
    // duplicate query-term rows must not inflate the evidence
    val dup = queries.union(queries)
    val again = Text.retrievalTopK(docs, "text", "doc_id", dup, "qid", "term", k = 3)
      .select("qid", "rank", "doc_id", "n_matched", "sum_tf", "dl")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(again == got)
    assertThrows[IllegalArgumentException](
      Text.retrievalTopK(docs, "text", "doc_id", queries, "doc_id", "term", k = 3))
  }

  test("termDrift scores the exact cross-proportion gap") {
    val a = Seq((1L, "x x y"), (2L, "x z")).toDF("id", "text")   // N_a=5: x3 y1 z1
    val b = Seq((3L, "y y z")).toDF("id", "text")                 // N_b=3: y2 z1
    val got = Text.termDrift(a, b, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).longValueExact())).toList
    // x: |3*3 - 0*5| = 9; y: |1*3 - 2*5| = 7; z: |1*3 - 1*5| = 2
    assert(got == List(("x", 3L, 0L, 9L), ("y", 1L, 2L, 7L), ("z", 1L, 1L, 2L)))
    // symmetric: swapping corpora keeps the same drift magnitudes
    val swapped = Text.termDrift(b, a, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getDecimal(3).longValueExact()).toMap
    assert(swapped == Map("x" -> 9L, "y" -> 7L, "z" -> 2L))
    // an empty side: every term of the other side drifts by c*N
    val empty = a.filter(col("id") < 0)
    val oneSided = Text.termDrift(a, empty, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getDecimal(3).longValueExact()).toMap
    assert(oneSided == Map("x" -> 0L, "y" -> 0L, "z" -> 0L))
  }

  test("pplBuckets: terciles per language, head = most typical text") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val model = Text.termStats(docs, "text", "doc_id")
    val got = Text.pplBuckets(docs, "text", "doc_id", "lang", model, buckets = 3)
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 3))
    // ntile balance: per language the bucket sizes differ by at most 1
    val sizes = rows.groupBy(r => (r.getString(1), r.getLong(3)))
      .map { case (k, v) => k -> v.length }
    for ((lang, perLang) <- sizes.groupBy(_._1._1)) {
      val ns = perLang.values.toSeq
      assert(ns.max - ns.min <= 1, s"unbalanced terciles for $lang: $ns")
    }
    // ordering contract: every head doc's commonness >= every tail doc's (same lang)
    val stats = Text.unigramStats(docs, "text", "doc_id", model)
      .collect().map(r => r.getLong(0) -> r.getLong(3).toDouble / r.getLong(1)).toMap
    for ((lang, perLang) <- rows.groupBy(_.getString(1))) {
      val head = perLang.filter(_.getLong(3) == 1L).map(r => stats(r.getLong(0)))
      val tail = perLang.filter(_.getLong(3) == 3L).map(r => stats(r.getLong(0)))
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max, s"tercile order broken for $lang")
    }
  }

  test("pplBucketsApprox tracks the exact terciles within estimation tolerance") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val model = Text.termStats(docs, "text", "doc_id")
    val exact = Text.pplBuckets(docs, "text", "doc_id", "lang", model, buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val approx = Text.pplBucketsApprox(docs, "text", "doc_id", "lang", model, buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(approx.keySet == exact.keySet)
    assert(approx.values.forall(b => b >= 1 && b <= 3))
    // scan-side assignment may slide boundary docs one bucket; >=90% agree
    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree >= (exact.size * 9) / 10,
      s"approx tier diverged: $agree/${exact.size} agree")
  }

  test("pplAssignStatic with full vocab is row-identical to pplBucketsApprox") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val model = Text.termStats(docs, "text", "doc_id")
    val vocab = Text.vocabMap(model, maxVocab = 1 << 20) // covers everything
    val cuts = Text.pplCutoffMap(docs, "text", "doc_id", "lang", model)
    val static = Text.pplAssignStatic(docs, "text", "doc_id", "lang", vocab, cuts)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val batch = Text.pplBucketsApprox(docs, "text", "doc_id", "lang", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(static == batch)
    // a pruned vocab still buckets every doc, an unseen language drops
    import spark.implicits._
    val pruned = Text.vocabMap(model, maxVocab = 50)
    val extra = docs.limit(5).withColumn("lang", lit("xx"))
    val out = Text.pplAssignStatic(docs.unionByName(extra),
      "text", "doc_id", "lang", pruned, cuts)
    assert(out.filter($"lang" === "xx").isEmpty)
    assert(out.count() == batch.size)
  }

  test("LM model save/load round-trips and reproduces pplAssignStatic exactly") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val model = Text.termStats(docs, "text", "doc_id")
    val vocab = Text.vocabMap(model, maxVocab = 1 << 20)
    val cuts = Text.pplCutoffMap(docs, "text", "doc_id", "lang", model)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").resolve("m").toString
    Text.saveLmModel(spark, dir, vocab, cuts)
    val (v2, c2) = Text.loadLmModel(spark, dir)
    assert(v2 == vocab && c2 == cuts) // bit-exact round trip
    val a = Text.pplAssignStatic(docs, "text", "doc_id", "lang", vocab, cuts)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = Text.pplAssignStatic(docs, "text", "doc_id", "lang", v2, c2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a == b)
  }

  test("qualityFilter keeps exactly the qualityScore rows above threshold") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
      .unionByName(Seq((-1L, "", "en", "syn", 0L), (-2L, "   ", "en", "syn", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val threshold = 4750L
    val scored = Text.qualityScore(docs, "text", "doc_id")
      .filter(col("score") >= threshold)
      .select("doc_id").as[Long].collect().toSet
    val kept = Text.qualityFilter(docs, "text", minScore = threshold)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == scored && kept.nonEmpty)
    assert(!kept.contains(-1L) && !kept.contains(-2L)) // degenerate docs dropped
    // schema preserved exactly
    assert(Text.qualityFilter(docs, "text", threshold).columns.toSeq
      == docs.columns.toSeq)
  }

  test("dataCard: exact census incl. duplicate-content rate") {
    val df = Seq(
      (1L, "a", "one two three"),
      (2L, "a", "one two three"),   // exact duplicate
      (3L, "a", "four"),
      (4L, "b", "x y")).toDF("id", "src", "text")
    val card = Text.dataCard(df, "text", Seq("src"))
      .orderBy("src").collect()
    assert(card.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSeq == Seq(
      ("a", 3L, 7L, 30L, 1L, 3L, 2L),  // 3 docs, 3+3+1 tokens, 13+13+4 chars, min 1, max 3, 2 distinct
      ("b", 1L, 2L, 3L, 2L, 2L, 1L)))
    // approx tier: same shape, count within the HLL error envelope
    val approx = Text.dataCard(df, "text", Seq("src"), exact = false)
      .orderBy("src").collect()
    assert(approx.map(_.getLong(6)).zip(card.map(_.getLong(6)))
      .forall { case (a, e) => math.abs(a - e) <= math.max(1L, e / 10) })
  }

  test("gopherFlags: hand-computed rule census on crafted documents") {
    val rules = Text.GopherRules(minWords = 3L, maxWords = 10L,
      minMeanLen = 2L, maxMeanLen = 6L, minAlphaPct = 80L,
      maxSymbolPct = 10L, minStopHits = 1L, maxTopTokenPct = 40L)
    val df = Seq(
      (1L, "the cat sat on a mat"), // clean prose: every rule passes
      (2L, "# # # # #"),            // symbol wall: fails len/alpha/sym/stop/top
      (3L, ""),                     // empty: fails word count (and stop)
      (4L, "word word word word"),  // repetition: fails stop + top-token
      (5L, "abc... def x")          // one '...' run -> n_symbols = 1
    ).toDF("doc_id", "text")
    val got = Text.gopherFlags(df, "text", "doc_id", rules)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (1 until 14).map(r.getLong)).toMap
    //            n_tok chars alpha sym stop top | words len alpha sym stop top | keep
    assert(got(1L) == Seq(6L, 15L, 6L, 0L, 3L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
    assert(got(2L) == Seq(5L, 5L, 0L, 5L, 0L, 5L, 1L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(got(3L) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 1L, 1L, 0L, 1L, 0L))
    assert(got(4L) == Seq(4L, 16L, 4L, 0L, 0L, 4L, 1L, 1L, 1L, 1L, 0L, 0L, 0L))
    // doc 5: tokens [abc..., def, x] chars 6+3+1=10, mean-len 6<=10<=18 ok,
    // symbols 1 -> 100 > 30 fails the 10% symbol rule (stop fails too)
    assert(got(5L) == Seq(3L, 10L, 3L, 1L, 0L, 1L, 1L, 1L, 1L, 0L, 0L, 1L, 0L))
  }

  test("gopherFilter keeps exactly the keep=1 rows and preserves the schema") {
    val rules = Text.GopherRules(minWords = 3L, maxWords = 10L,
      minMeanLen = 2L, maxMeanLen = 6L, minAlphaPct = 80L,
      maxSymbolPct = 10L, minStopHits = 1L, maxTopTokenPct = 40L)
    val df = Seq(
      (1L, "the cat sat on a mat", "m1"),
      (2L, "# # # # #", "m2"),
      (3L, "", "m3"),
      (4L, "it is a cat", "m4")).toDF("doc_id", "text", "meta")
    val kept = Text.gopherFilter(df, "text", rules)
    assert(kept.columns.toSeq == df.columns.toSeq)
    val expected = Text.gopherFlags(df, "text", "doc_id", rules)
      .filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet
    assert(kept.select("doc_id").as[Long].collect().toSet == expected)
    assert(expected == Set(1L, 4L))
  }

  test("vocabCoverage: exact Zipf checkpoints incl. the capped tail") {
    val df = Seq("a a a b", "b c").toDF("text")
    val got = Text.vocabCoverage(df, "text", Seq(1, 2, 10))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // tf: a=3, b=2, c=1; total 6 occurrences, 3 terms
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 6L, 3L),
      (2L, 2L, 5L, 6L, 3L),
      (10L, 3L, 6L, 6L, 3L)))  // k past the vocab: n_vocab caps at 3
  }

  test("repetitionFlags: hand-computed top/dup gram coverage") {
    val df = Seq(
      (1L, "a b a b a b"),               // alternating: heavy 2-4 gram tops
      (2L, "p q r s t u p q r s t u v"), // repeated 6-token run
      (3L, "alpha beta gamma delta"),    // all distinct: zero coverage
      (4L, "")                           // empty: zero everything, passes
    ).toDF("doc_id", "text")
    val got = Text.repetitionFlags(df, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (1 until 21).map(r.getLong)).toMap
    // columns: token_chars, top2/3/4_chars, dup5..10_chars,
    //          flag_top2/3/4, flag_dup5..10, keep
    // doc 1: "a b" x3 -> 6, "a b a" x2 -> 6, "a b a b" x2 -> 8; no
    // 5-gram repeats; top ceilings (20/18/16% of 6 chars) all fail
    assert(got(1L) == Seq(6L, 6L, 6L, 8L, 0L, 0L, 0L, 0L, 0L, 0L,
      0L, 0L, 0L, 1L, 1L, 1L, 1L, 1L, 1L, 0L))
    // doc 2: dup 5-gram and 6-gram runs cover tokens 1..12 of 13 ->
    // 12 chars; top-n = 2 occurrences x n chars (1-char tokens)
    assert(got(2L) == Seq(13L, 4L, 6L, 8L, 12L, 12L, 0L, 0L, 0L, 0L,
      0L, 0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L, 0L))
    // doc 3: zero coverage everywhere -> every ceiling passes
    assert(got(3L) == Seq(19L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
      1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
    // doc 4: empty doc passes every repetition rule (0 <= p*0)
    assert(got(4L) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
      1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
  }

  test("repetitionFilter keeps exactly the keep=1 rows, schema intact") {
    val df = Seq(
      (1L, "a b a b a b", "m1"),
      (2L, "p q r s t u p q r s t u v", "m2"),
      (3L, "alpha beta gamma delta", "m3"),
      (4L, "", "m4")).toDF("doc_id", "text", "meta")
    val kept = Text.repetitionFilter(df, "text")
    assert(kept.columns.toSeq == df.columns.toSeq)
    val expected = Text.repetitionFlags(df, "text", "doc_id")
      .filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet
    assert(kept.select("doc_id").as[Long].collect().toSet == expected)
    assert(expected == Set(3L, 4L))
  }

  test("qualityScore per-mille features are exact on a known document") {
    // "aa bb. 12" -> n_chars=9, tokens=[aa,bb.,12] n_tokens=3, token_chars=7,
    // punct=1, digit=2, stopword_hits=0
    val df = Seq((7L, "aa bb. 12")).toDF("doc_id", "text")
    val r = Text.qualityScore(df, "text", "doc_id").collect().head
    assert(r.getLong(2) == 0L)                 // stop_milli
    assert(r.getLong(3) == 1000 * 1 / 9)       // punct_milli = 111
    assert(r.getLong(4) == 1000 * 2 / 9)       // digit_milli = 222
    assert(r.getLong(5) == 1000 * 7 / 3)       // toklen_milli = 2333
    // score = 0 + 4*0 - 2*111 - 3*222 + 1*2333 = 1445
    assert(r.getLong(6) == 1445L)
  }
}
