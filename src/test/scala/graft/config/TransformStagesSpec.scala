package graft.config

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Pipeline, TestSpark}

class TransformStagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cfg(extra: String): PipelineConfig = {
    val out = Files.createTempDirectory("graft-tf").resolve("out").toString
    PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/documents.parquet
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |$extra""".stripMargin)
      .fold(e => fail(s"parse failed: $e"), identity)
  }

  test("full curation chain from config: dedup -> cap -> split") {
    val c = cfg(
      """transforms: dedupExact, sourceCap, split
        |transform.dedupExact.idColumn: doc_id
        |transform.dedupExact.textColumn: text
        |transform.sourceCap.groupColumns: source
        |transform.sourceCap.idColumn: doc_id
        |transform.sourceCap.textColumn: text
        |transform.sourceCap.k: 10
        |transform.split.keyColumn: doc_id
        |transform.split.fractions: train=90, val=10
        |transform.split.denom: 100
        |""".stripMargin)
    assert(c.transforms.map(_.name) == List("dedupExact", "sourceCap", "split"))
    val result = Pipeline.run(spark, c)
    val out = spark.read.parquet(c.target.asInstanceOf[TargetConfig.Parquet].path)
    assert(out.columns.contains("split"))
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.nonEmpty && perSource.forall(_.getLong(1) <= 10))
    assert(out.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val")))
    assert(result.rowsCopied == out.count())
    // stages also surface in the redacted render
    assert(c.renderRedacted.contains("dedupExact,sourceCap,split"))
  }

  test("dedupExact keeps the min id per distinct text") {
    val c = cfg(
      """transforms: dedupExact
        |transform.dedupExact.idColumn: doc_id
        |transform.dedupExact.textColumn: text
        |""".stripMargin)
    val got = Pipeline.transform(Pipeline.read(spark, c), c)
    val expect = graft.Tables.load(spark, TestSpark.sf, "documents")
      .groupBy("text").agg(min("doc_id").as("doc_id"))
    assert(got.count() == expect.count())
    assert(got.join(expect, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("normalize and spanDedup stages compose on the input schema") {
    import spark.implicits._
    // normalize: damage the text, then the stage must canonicalize it
    val c1 = cfg(
      """transforms: normalize
        |transform.normalize.textColumn: text
        |""".stripMargin)
    val dirty = Seq((1L, "  A   B "), (2L, "ok")).toDF("doc_id", "text")
    val cleaned = Pipeline.transform(dirty, c1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned == Map(1L -> "a b", 2L -> "ok"))

    // spanDedup: text column replaced by the cleaned text, other
    // columns intact, schema unchanged
    val c2 = cfg(
      """transforms: spanDedup
        |transform.spanDedup.idColumn: doc_id
        |transform.spanDedup.textColumn: text
        |transform.spanDedup.spanTokens: 3
        |transform.spanDedup.minDocs: 2
        |""".stripMargin)
    val docs = Seq(
      (1L, "alpha beta gamma the same footer", "s1"),
      (2L, "delta echo foxtrot the same footer", "s2")).toDF("doc_id", "text", "source")
    val out = Pipeline.transform(docs, c2)
    assert(out.columns.sorted.toSeq == Seq("doc_id", "source", "text"))
    val m = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("text"), r.getAs[String]("source"))).toMap
    assert(m(1L) == (("alpha beta gamma", "s1")))
    assert(m(2L) == (("delta echo foxtrot", "s2")))
    // eager validation
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |transforms: spanDedup
         |transform.spanDedup.idColumn: doc_id
         |transform.spanDedup.textColumn: text
         |transform.spanDedup.minDocs: 1
         |""".stripMargin).swap.exists(_.contains("minDocs")))
  }

  test("spanDedup stage preserves input multiplicity: null ids kept, duplicate ids not multiplied") {
    import spark.implicits._
    val c = cfg(
      """transforms: spanDedup
        |transform.spanDedup.idColumn: doc_id
        |transform.spanDedup.textColumn: text
        |transform.spanDedup.spanTokens: 3
        |transform.spanDedup.minDocs: 2
        |""".stripMargin)
    val docs = Seq(
      (Some(1L), "alpha beta gamma the same footer", "s1"),
      (Some(2L), "delta echo foxtrot the same footer", "s2"),
      (None, "null id row survives untouched", "s3"),
      (Some(4L), "dup id first copy", "s4"),
      (Some(4L), "dup id first copy", "s4"))
      .toDF("doc_id", "text", "source")
    val out = Pipeline.transform(docs, c)
    // exactly one output row per input row — no silent drops, no join fan-out
    assert(out.count() == 5)
    assert(out.filter(col("doc_id").isNull).count() == 1)
    assert(out.filter(col("doc_id").isNull).select("text").as[String].head()
      == "null id row survives untouched")
    assert(out.filter(col("doc_id") === 4L).count() == 2)
    // the boilerplate span is still removed from the joinable rows
    val m = out.filter(col("doc_id").isin(1L, 2L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(m == Map(1L -> "alpha beta gamma", 2L -> "delta echo foxtrot"))
  }

  test("curation chain from config: normalize -> minhashDedup -> split through Pipeline.run") {
    val c = cfg(
      """transforms: normalize, minhashDedup, split
        |transform.normalize.textColumn: text
        |transform.minhashDedup.idColumn: doc_id
        |transform.minhashDedup.textColumn: text
        |transform.minhashDedup.shingleSize: 1
        |transform.split.keyColumn: doc_id
        |transform.split.fractions: train=90, val=10
        |""".stripMargin)
    assert(c.transforms.map(_.name) == List("normalize", "minhashDedup", "split"))
    val result = Pipeline.run(spark, c)
    val out = spark.read.parquet(c.target.asInstanceOf[TargetConfig.Parquet].path)
    assert(result.rowsCopied == out.count() && out.count() > 0)
    assert(out.columns.contains("split"))
    // near-dup removal really happened (the synthetic corpus is
    // near-dup saturated), and survivors are the min-id representatives
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    assert(out.count() < docs.count())
    assert(out.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val")))
  }

  test("minhashDedup keepLongest keeps each cluster's longest member, not its min id") {
    val c = cfg(
      """transforms: minhashDedup
        |transform.minhashDedup.idColumn: doc_id
        |transform.minhashDedup.textColumn: text
        |transform.minhashDedup.shingleSize: 1
        |transform.minhashDedup.keepLongest: true
        |""".stripMargin)
    Pipeline.run(spark, c)
    val out = spark.read.parquet(c.target.asInstanceOf[TargetConfig.Parquet].path)
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    assert(out.count() < docs.count() && out.count() > 0)
    // replay the policy directly: same survivors as bestRepresentatives
    import org.apache.spark.sql.functions.{col, length}
    val sh = docs.select(col("doc_id"),
        graft.pipeline.Dedup.shingles("text", 1).as("__sh"))
      .withColumn("__sig", graft.pipeline.Dedup.minHashSignature(col("__sh"), 64))
    val verified = graft.pipeline.Dedup.verifyJaccard(
      graft.pipeline.Dedup.lshCandidates(sh, "doc_id", "__sig", 16, 4),
      sh, "doc_id", "__sh", 9, 10).select("id_a", "id_b")
    val labels = graft.pipeline.Dedup.clusterRepresentatives(
      docs.select(col("doc_id")), verified, "doc_id")
    val want = graft.pipeline.Dedup.bestRepresentatives(labels,
        docs.select(col("doc_id"), length(col("text")).cast("long").as("sc")),
        "doc_id", "sc")
      .select(col("keep_id").as("doc_id"))
    assert(out.select("doc_id").exceptAll(want).isEmpty &&
      want.exceptAll(out.select("doc_id")).isEmpty)
  }

  test("semanticDedup stage keeps one representative per near-identical embedding group") {
    import spark.implicits._
    val c = cfg(
      """transforms: semanticDedup
        |transform.semanticDedup.idColumn: vec_id
        |transform.semanticDedup.vecColumn: embedding
        |transform.semanticDedup.threshold: 0.99
        |""".stripMargin)
    // two exact-duplicate groups + one singleton
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Pipeline.transform(rows, c)
    assert(out.columns.toSeq == Seq("vec_id", "embedding"))
    assert(out.select("vec_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
  }

  test("decontaminate stage drops rows sharing n-grams with the reference corpus") {
    import spark.implicits._
    val refDir = java.nio.file.Files.createTempDirectory("graft-decon-ref")
      .resolve("ref").toString
    Seq((100L, "the forbidden eval passage here"))
      .toDF("doc_id", "text").write.parquet(refDir)
    val c = cfg(
      s"""transforms: decontaminate
         |transform.decontaminate.idColumn: doc_id
         |transform.decontaminate.textColumn: text
         |transform.decontaminate.referencePath: $refDir
         |transform.decontaminate.ngram: 3
         |""".stripMargin)
    val docs = Seq(
      (1L, "contains the forbidden eval passage verbatim", "s1"),
      (2L, "completely unrelated training document text", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Pipeline.transform(docs, c)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(out.columns.toSeq == docs.columns.toSeq)
  }

  test("seqPack stage reshapes to the packed-sequence layout") {
    import spark.implicits._
    val c = cfg(
      """transforms: seqPack
        |transform.seqPack.idColumn: doc_id
        |transform.seqPack.textColumn: text
        |transform.seqPack.budget: 4
        |transform.seqPack.shardWidth: 1000
        |""".stripMargin)
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f")).toDF("doc_id", "text")
    val out = Pipeline.transform(docs, c)
    assert(out.columns.toSeq == Seq("doc_id", "seq_id", "seq_pos", "tok_used"))
    // every doc packed exactly once, budget respected per sequence
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val perSeq = out.groupBy("seq_id").agg(sum("tok_used").as("t")).collect()
    assert(perSeq.forall(_.getLong(1) <= 4))
  }

  test("mixToTarget stage rebalances to the target mixture and drops unweighted groups") {
    val c = cfg(
      """transforms: mixToTarget
        |transform.mixToTarget.keyColumn: doc_id
        |transform.mixToTarget.groupColumn: lang
        |transform.mixToTarget.weights: en=5, de=2, fr=2, zh=1
        |transform.mixToTarget.wDenom: 10
        |""".stripMargin)
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val out = Pipeline.transform(docs, c)
    assert(out.columns.toSeq == docs.columns.toSeq)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en", "de", "fr", "zh")) // es has no weight -> dropped
    assert(out.count() > 0 && out.count() < docs.count())
    // config round-trip matches the direct operator call
    val direct = graft.operators.Sampling.mixToTarget(docs, "doc_id", "lang",
      Map("en" -> 5, "de" -> 2, "fr" -> 2, "zh" -> 1), 10)
    assert(out.count() == direct.count())
  }

  test("outlierFilter stage drops group-relative outliers, keeps the schema") {
    import spark.implicits._
    val c = cfg(
      """transforms: outlierFilter
        |transform.outlierFilter.valueColumn: n
        |transform.outlierFilter.groupColumn: grp
        |transform.outlierFilter.z: 2.0
        |""".stripMargin)
    val rows = ((1 to 9).map(i => (i.toLong, "a", 10L)) :+ ((10L, "a", 100L)))
      .toDF("id", "grp", "n")
    val out = Pipeline.transform(rows, c)
    assert(out.columns.toSeq == Seq("id", "grp", "n"))
    assert(out.select("id").collect().map(_.getLong(0)).toSet == (1L to 9L).toSet)
  }

  test("end-to-end LLM curation pipeline from one config: normalize -> qualityFilter -> dedupExact -> mixToTarget -> seqPack") {
    val c = cfg(
      """transforms: normalize, qualityFilter, dedupExact, mixToTarget, seqPack
        |transform.normalize.textColumn: text
        |transform.qualityFilter.textColumn: text
        |transform.qualityFilter.minScore: 4000
        |transform.dedupExact.idColumn: doc_id
        |transform.dedupExact.textColumn: text
        |transform.mixToTarget.keyColumn: doc_id
        |transform.mixToTarget.groupColumn: lang
        |transform.mixToTarget.weights: en=5, de=2, fr=2, zh=1
        |transform.mixToTarget.wDenom: 10
        |transform.seqPack.idColumn: doc_id
        |transform.seqPack.textColumn: text
        |transform.seqPack.budget: 256
        |transform.seqPack.shardWidth: 64
        |""".stripMargin)
    assert(c.transforms.map(_.name)
      == List("normalize", "qualityFilter", "dedupExact", "mixToTarget", "seqPack"))
    val result = Pipeline.run(spark, c)
    val out = spark.read.parquet(c.target.asInstanceOf[TargetConfig.Parquet].path)
    // terminal reshape: packed-sequence layout, every pack within budget
    assert(result.rowsCopied == out.count() && out.count() > 0)
    val packCols = out.columns.toSet
    assert(packCols.contains("seq_id") || packCols.contains("pack_id"),
      s"expected packed layout, got ${out.columns.mkString(",")}")
  }

  test("round-8 stages compose in one config: pplFilter -> dsirFilter -> dupSpanCut") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val tDir = Files.createTempDirectory("graft-r8-target").resolve("t").toString
    docs.filter(org.apache.spark.sql.functions.col("source") === "src0")
      .write.mode("overwrite").parquet(tDir)
    val out = Pipeline.transform(docs, cfg(
      s"""transforms: pplFilter, dsirFilter, dupSpanCut
         |transform.pplFilter.idColumn: doc_id
         |transform.pplFilter.textColumn: text
         |transform.pplFilter.langColumn: lang
         |transform.pplFilter.keep: 1, 2
         |transform.dsirFilter.idColumn: doc_id
         |transform.dsirFilter.textColumn: text
         |transform.dsirFilter.targetPath: $tDir
         |transform.dsirFilter.keepNum: 3
         |transform.dsirFilter.keepDenom: 4
         |transform.dupSpanCut.idColumn: doc_id
         |transform.dupSpanCut.textColumn: text
         |transform.dupSpanCut.gramTokens: 6
         |""".stripMargin))
    assert(out.columns.toSeq == docs.columns.toSeq)
    val n = docs.count()
    // ppl keeps ~2/3, dsir keeps ~3/4 of that: between a third and ~65%
    assert(out.count() > n / 3 && out.count() < (n * 13) / 20,
      s"kept ${out.count()} of $n")
  }

  test("dsirFilter stage keeps the top-weight fraction against a target corpus") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val tDir = Files.createTempDirectory("graft-dsir-target").resolve("t").toString
    docs.filter(org.apache.spark.sql.functions.col("source") === "src0")
      .write.mode("overwrite").parquet(tDir)
    val out = Pipeline.transform(docs, cfg(
      s"""transforms: dsirFilter
         |transform.dsirFilter.idColumn: doc_id
         |transform.dsirFilter.textColumn: text
         |transform.dsirFilter.targetPath: $tDir
         |transform.dsirFilter.buckets: 16
         |transform.dsirFilter.keepNum: 1
         |transform.dsirFilter.keepDenom: 2
         |""".stripMargin))
    assert(out.columns.toSeq == docs.columns.toSeq)
    val n = docs.count()
    // half by approx cutoff: allow estimation + tie slack
    assert(out.count() > (n * 3) / 10 && out.count() < (n * 7) / 10,
      s"kept ${out.count()} of $n")
    // eager validation: malformed fraction fails at parse/check time
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/documents.parquet
         |target.type: parquet
         |target.path: /tmp/graft-dsir-unused
         |transforms: dsirFilter
         |transform.dsirFilter.idColumn: doc_id
         |transform.dsirFilter.textColumn: text
         |transform.dsirFilter.targetPath: $tDir
         |transform.dsirFilter.keepNum: 3
         |transform.dsirFilter.keepDenom: 2
         |""".stripMargin).swap.exists(_.contains("0 < num <= denom")))
  }

  test("dupSpanCut stage rewrites only span-bearing docs, multiplicity preserved") {
    import spark.implicits._
    val c = cfg(
      """transforms: dupSpanCut
        |transform.dupSpanCut.idColumn: doc_id
        |transform.dupSpanCut.textColumn: text
        |transform.dupSpanCut.gramTokens: 4
        |""".stripMargin)
    val docs = Seq(
      (Some(1L), "one two three four tail-a", "s1"),
      (Some(2L), "one two three four tail-b", "s2"),
      (None, "untouched  null-id   row!", "s3"),   // odd spacing must survive
      (Some(4L), "clean row with  DOUBLE space", "s4"),
      (Some(5L), "dup id copy", "s5"),
      (Some(5L), "dup id copy", "s5"))
      .toDF("doc_id", "text", "source")
    val out = Pipeline.transform(docs, c)
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.count() == docs.count())
    val byText = out.collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
      r.getString(1))).toSeq
    // the shared 4-gram "one two three four" is cut from both carriers
    assert(byText.contains(Some(1L) -> "tail-a"))
    assert(byText.contains(Some(2L) -> "tail-b"))
    // clean docs keep their original bytes (double spaces intact)
    assert(byText.contains(None -> "untouched  null-id   row!"))
    assert(byText.contains(Some(4L) -> "clean row with  DOUBLE space"))
    assert(byText.count(_ == (Some(5L) -> "dup id copy")) == 2)
    // eager validation
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/documents.parquet
         |target.type: parquet
         |target.path: /tmp/graft-dsc-unused
         |transforms: dupSpanCut
         |transform.dupSpanCut.idColumn: doc_id
         |transform.dupSpanCut.textColumn: text
         |transform.dupSpanCut.minCount: 1
         |""".stripMargin).swap.exists(_.contains("minCount must be > 1")))
  }

  test("pplFilter stage keeps the chosen perplexity buckets, schema preserved") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    def run(extra: String) = Pipeline.transform(docs, cfg(
      s"""transforms: pplFilter
         |transform.pplFilter.idColumn: doc_id
         |transform.pplFilter.textColumn: text
         |transform.pplFilter.langColumn: lang
         |$extra""".stripMargin))
    val head = run("transform.pplFilter.keep: 1\n")
    assert(head.columns.toSeq == docs.columns.toSeq)
    val n = docs.count()
    // head tercile keeps roughly a third (percentile estimation slack)
    assert(head.count() > n / 5 && head.count() < n / 2)
    // keeping every bucket keeps every scoreable doc (all docs tokenize here)
    val all = run("transform.pplFilter.keep: 1, 2, 3\n")
    assert(all.count() == n)
    // exact tier agrees on the bucket-1 proportion contract
    val exact = run("transform.pplFilter.keep: 1\ntransform.pplFilter.approx: false\n")
    assert(exact.count() > n / 5 && exact.count() < n / 2)
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/documents.parquet
         |target.type: parquet
         |target.path: /tmp/graft-ppl-unused
         |transforms: pplFilter
         |transform.pplFilter.idColumn: doc_id
         |transform.pplFilter.textColumn: text
         |transform.pplFilter.langColumn: lang
         |transform.pplFilter.keep: 4
         |""".stripMargin).swap.exists(_.contains("must be in 1..3")))
  }

  test("tokenBudget stage keeps each group within budget through config") {
    val c = cfg(
      """transforms: tokenBudget
        |transform.tokenBudget.groupColumn: lang
        |transform.tokenBudget.keyColumn: doc_id
        |transform.tokenBudget.tokenColumn: n_chars
        |transform.tokenBudget.budget: 20000
        |""".stripMargin)
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val out = Pipeline.transform(docs, c)
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.count() > 0 && out.count() < docs.count())
    out.groupBy("lang").agg(sum("n_chars").as("s")).collect()
      .foreach(r => assert(r.getLong(1) <= 20000L))
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/documents.parquet
         |target.type: parquet
         |target.path: /tmp/graft-tb-unused
         |transforms: tokenBudget
         |transform.tokenBudget.groupColumn: lang
         |transform.tokenBudget.keyColumn: doc_id
         |transform.tokenBudget.tokenColumn: n_chars
         |transform.tokenBudget.budget: 20000
         |transform.tokenBudget.shards: 3
         |""".stripMargin).swap.exists(_.contains("power of two")))
  }

  test("incrDedup stage drops reference copies and in-batch dups through config") {
    import spark.implicits._
    val refDir = Files.createTempDirectory("graft-incr-ref").resolve("prior").toString
    Seq((100L, "seen before")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(refDir)
    val c = cfg(
      s"""transforms: incrDedup
         |transform.incrDedup.idColumn: doc_id
         |transform.incrDedup.textColumn: text
         |transform.incrDedup.referencePath: $refDir
         |""".stripMargin)
    val rows = Seq((1L, "seen before"), (2L, "brand new"), (3L, "brand new"))
      .toDF("doc_id", "text")
    val out = Pipeline.transform(rows, c)
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("qualityFilter stage drops low-quality rows, keeps the schema") {
    import spark.implicits._
    val c = cfg(
      """transforms: qualityFilter
        |transform.qualityFilter.textColumn: text
        |transform.qualityFilter.minScore: 4000
        |""".stripMargin)
    // prose: stop_milli=555 (5/9), toklen_milli=2777 -> score 4997
    // digit wall: digit_milli=888 (24/27), toklen_milli=6000 -> score 3336
    val rows = Seq(
      (1L, "the cat sat on the mat with a hat"),
      (2L, "000000 111111 222222 333333"),
      (3L, "")).toDF("id", "text")               // degenerate -> dropped
    val out = Pipeline.transform(rows, c)
    assert(out.columns.toSeq == Seq("id", "text"))
    assert(out.select("id").as[Long].collect().toSet == Set(1L))
    // config round-trip matches the direct operator call
    val direct = graft.pipeline.Text.qualityFilter(rows, "text", 4000L)
    assert(direct.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("gopherFilter stage applies the full rule set, keeps the schema") {
    import spark.implicits._
    val c = cfg(
      """transforms: gopherFilter
        |transform.gopherFilter.textColumn: text
        |transform.gopherFilter.minWords: 3
        |transform.gopherFilter.maxWords: 10
        |transform.gopherFilter.minMeanLen: 2
        |transform.gopherFilter.maxMeanLen: 6
        |transform.gopherFilter.minStopHits: 1
        |transform.gopherFilter.maxTopTokenPct: 40
        |""".stripMargin)
    val rows = Seq(
      (1L, "the cat sat on a mat", "m"),  // passes every rule
      (2L, "# # # # #", "m"),             // symbol wall
      (3L, "word word word word", "m"),   // repetition + no stopwords
      (4L, "", "m")).toDF("id", "text", "meta")
    val out = Pipeline.transform(rows, c)
    assert(out.columns.toSeq == Seq("id", "text", "meta"))
    assert(out.select("id").as[Long].collect().toSet == Set(1L))
    // config round-trip matches the direct operator call
    val direct = graft.pipeline.Text.gopherFilter(rows, "text",
      graft.pipeline.Text.GopherRules(3L, 10L, 2L, 6L, 80L, 10L, 1L, 40L))
    assert(direct.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("repetitionFilter stage drops repetitive docs, keeps the schema") {
    import spark.implicits._
    val c = cfg(
      """transforms: repetitionFilter
        |transform.repetitionFilter.textColumn: text
        |""".stripMargin)
    val rows = Seq(
      (1L, "spam spam spam spam spam ham", "m"), // top-2-gram wall
      (2L, "alpha beta gamma delta", "m"),       // all distinct
      (3L, "", "m")).toDF("id", "text", "meta")  // empty passes
    val out = Pipeline.transform(rows, c)
    assert(out.columns.toSeq == Seq("id", "text", "meta"))
    assert(out.select("id").as[Long].collect().toSet == Set(2L, 3L))
    // explicit ceilings round-trip: a 200% ceiling keeps everything
    val lax = cfg(
      """transforms: repetitionFilter
        |transform.repetitionFilter.textColumn: text
        |transform.repetitionFilter.topPcts: 200, 200, 200
        |transform.repetitionFilter.dupPcts: 200
        |""".stripMargin)
    assert(Pipeline.transform(rows, lax).count() == 3L)
  }

  test("semanticDecontaminate stage drops rows near the reference embeddings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semdecon")
    val refPath = dir.resolve("ref").toString
    Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("embedding")
      .write.mode("overwrite").parquet(refPath)
    val c = cfg(
      s"""transforms: semanticDecontaminate
         |transform.semanticDecontaminate.vecColumn: embedding
         |transform.semanticDecontaminate.referencePath: $refPath
         |transform.semanticDecontaminate.minDot: 16100
         |""".stripMargin)
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), "copy of the benchmark"),
      (2L, Seq(0.99f, 0.1f), "paraphrase"),
      (3L, Seq(0.0f, 1.0f), "unrelated")).toDF("vec_id", "embedding", "text")
    val out = Pipeline.transform(rows, c)
    assert(out.columns.toSeq == rows.columns.toSeq)
    assert(out.select("vec_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("repetitionFilter stage rejects bad ceiling lists eagerly") {
    def parseErr(extra: String): String =
      PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: x
           |target.type: parquet
           |target.path: y
           |transforms: repetitionFilter
           |transform.repetitionFilter.textColumn: text
           |$extra
           |""".stripMargin).swap.getOrElse(fail("expected a parse error"))
    assert(parseErr("transform.repetitionFilter.topPcts: 20, nope")
      .contains("not a comma list of longs"))
    assert(parseErr("transform.repetitionFilter.topPcts: -5")
      .contains("ceilings must be >= 0"))
  }

  test("gopherFilter stage rejects inverted bounds eagerly") {
    val err = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |transforms: gopherFilter
         |transform.gopherFilter.textColumn: text
         |transform.gopherFilter.minWords: 100
         |transform.gopherFilter.maxWords: 10
         |""".stripMargin).swap.getOrElse(fail("expected a parse error"))
    assert(err.contains("minWords <= maxWords"))
  }

  test("new stages validate eagerly") {
    def parseErr(extra: String): String =
      PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: x
           |target.type: parquet
           |target.path: y
           |$extra""".stripMargin).swap.getOrElse(fail("expected a parse error"))
    assert(parseErr(
      """transforms: minhashDedup
        |transform.minhashDedup.idColumn: doc_id
        |transform.minhashDedup.textColumn: text
        |transform.minhashDedup.numHashes: 60
        |""".stripMargin).contains("bands*rowsPerBand"))
    assert(parseErr(
      """transforms: semanticDedup
        |transform.semanticDedup.idColumn: id
        |transform.semanticDedup.vecColumn: v
        |transform.semanticDedup.threshold: 1.5
        |""".stripMargin).contains("cosine"))
    assert(parseErr(
      """transforms: decontaminate
        |transform.decontaminate.idColumn: id
        |transform.decontaminate.textColumn: t
        |""".stripMargin).contains("referencePath required"))
    assert(parseErr(
      """transforms: seqPack
        |transform.seqPack.idColumn: id
        |transform.seqPack.textColumn: t
        |transform.seqPack.budget: 0
        |""".stripMargin).contains("budget must be positive"))
    assert(parseErr(
      """transforms: mixToTarget
        |transform.mixToTarget.keyColumn: id
        |transform.mixToTarget.groupColumn: g
        |transform.mixToTarget.weights: a=60, b=60
        |""".stripMargin).contains("sum to <= wDenom"))
    assert(parseErr(
      """transforms: mixToTarget
        |transform.mixToTarget.keyColumn: id
        |transform.mixToTarget.groupColumn: g
        |transform.mixToTarget.weights: a=10, a=20
        |""".stripMargin).contains("duplicate group"))
    assert(parseErr(
      """transforms: outlierFilter
        |transform.outlierFilter.valueColumn: v
        |transform.outlierFilter.groupColumn: g
        |transform.outlierFilter.z: -1
        |""".stripMargin).contains("z must be positive"))
  }

  test("config errors are eager: unknown stage, missing key, bad fractions") {
    def parseErr(extra: String): String =
      PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: x
           |target.type: parquet
           |target.path: y
           |$extra""".stripMargin).swap.getOrElse(fail("expected a parse error"))
    assert(parseErr("transforms: vacuum\n").contains("unknown transform stage"))
    assert(parseErr("transforms: dedupExact\n")
      .contains("transform.dedupExact.idColumn required"))
    assert(parseErr(
      """transforms: split
        |transform.split.keyColumn: doc_id
        |transform.split.fractions: train=60, val=60
        |""".stripMargin).contains("fit in denom"))
    assert(parseErr(
      """transforms: sourceCap
        |transform.sourceCap.idColumn: doc_id
        |transform.sourceCap.textColumn: text
        |transform.sourceCap.k: 0
        |""".stripMargin).contains("k must be positive"))
    // stream + transforms cannot combine
    assert(parseErr(
      """transforms: split
        |transform.split.keyColumn: doc_id
        |transform.split.fractions: train=100
        |stream.changesDir: /tmp/c
        |stream.checkpointDir: /tmp/k
        |stream.primaryKey: pk
        |stream.orderBy: ts
        |""".stripMargin).contains("batch copies"))
    // annSearch: required keys and positive k/nProbe validated at load
    assert(parseErr("transforms: annSearch\n")
      .contains("transform.annSearch.indexRoot required"))
    assert(parseErr(
      """transforms: annSearch
        |transform.annSearch.indexRoot: /tmp/ix
        |transform.annSearch.idColumn: vec_id
        |transform.annSearch.vecColumn: embedding
        |transform.annSearch.k: 0
        |""".stripMargin).contains("k must be >= 1"))
    assert(parseErr(
      """transforms: annSearch
        |transform.annSearch.indexRoot: /tmp/ix
        |transform.annSearch.idColumn: vec_id
        |transform.annSearch.vecColumn: embedding
        |transform.annSearch.filterPath: /tmp/allowed
        |""".stripMargin).contains("filterPath and filterColumn go together"))
  }

  test("annSearch stage against a VERSIONED root resolves _LATEST and matches the library") {
    import graft.pipeline.AnnIndex
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val root = Files.createTempDirectory("graft-tf-annver").resolve("idx").toString
    // v1 over part of the corpus, v2 (the pointer) over all of it —
    // the stage must serve v2
    AnnIndex.buildVersioned(emb.filter(col("vec_id") < 300), "vec_id", "embedding",
      root, kIvf = 8, m = 16, ksub = 16, iters = 2)
    AnnIndex.buildVersioned(emb, "vec_id", "embedding",
      root, kIvf = 8, m = 16, ksub = 16, iters = 2)
    val qdir = Files.createTempDirectory("graft-tf-annq").resolve("q").toString
    emb.filter(col("vec_id") < 3).write.parquet(qdir)
    val c = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $qdir
         |target.type: parquet
         |target.path: ${Files.createTempDirectory("graft-tf-anno").resolve("o")}
         |target.mode: overwrite
         |transforms: annSearch
         |transform.annSearch.indexRoot: $root
         |transform.annSearch.idColumn: vec_id
         |transform.annSearch.vecColumn: embedding
         |transform.annSearch.k: 5
         |transform.annSearch.nProbe: 4
         |transform.annSearch.versioned: true
         |""".stripMargin).fold(e => fail(s"parse failed: $e"), identity)
    Pipeline.run(spark, c)
    val got = spark.read.parquet(c.target.asInstanceOf[TargetConfig.Parquet].path)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = AnnIndex.search(AnnIndex.openLatest(spark, root),
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    // and v2 really is the served index: it holds a vector v1 never saw
    assert(spark.read.parquet(AnnIndex.openLatest(spark, root).indexPath)
      .filter(col("neighbor_id") === 499L).count() == 1L)
    assert(spark.read.parquet(AnnIndex.openVersion(spark, root, 1L).indexPath)
      .filter(col("neighbor_id") === 499L).count() == 0L)
  }

  test("annIngest stage: passthrough, exactly-once under its tag across re-runs") {
    import graft.pipeline.AnnIndex
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val root = Files.createTempDirectory("graft-tf-anni").resolve("idx").toString
    AnnIndex.build(emb.filter(col("vec_id") < 400), "vec_id", "embedding", root,
      kIvf = 8, m = 16, ksub = 16, iters = 2)
    val c = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/embeddings.parquet
         |target.type: parquet
         |target.path: ${Files.createTempDirectory("graft-tf-annio").resolve("o")}
         |target.mode: overwrite
         |transforms: annIngest
         |transform.annIngest.indexRoot: $root
         |transform.annIngest.idColumn: vec_id
         |transform.annIngest.vecColumn: embedding
         |transform.annIngest.tag: e9
         |""".stripMargin).fold(e => fail(s"parse failed: $e"), identity)
    def counts: Map[Long, Long] = {
      spark.catalog.refreshByPath(s"$root/index")
      spark.read.parquet(s"$root/index").groupBy("neighbor_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    Pipeline.run(spark, c)
    // passthrough: the target carries ALL piped rows unchanged
    assert(spark.read.parquet(c.target.asInstanceOf[TargetConfig.Parquet].path)
      .count() == emb.count())
    val after1 = counts
    assert(after1.size.toLong == emb.count() && after1.values.forall(_ == 1L),
      "every vector indexed exactly once after the ingest stage")
    // a re-run of the same config (same tag) retires-and-redoes:
    // end state identical, nothing double-inserted
    Pipeline.run(spark, c)
    assert(counts == after1)
  }

  test("transformAudited: kept frame matches plain transform; reshape stages fail fast") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val c = cfg(
      """transforms: qualityFilter, dedupExact
        |transform.qualityFilter.textColumn: text
        |transform.qualityFilter.minScore: 4750
        |transform.dedupExact.idColumn: doc_id
        |transform.dedupExact.textColumn: text
        |""".stripMargin)
    val (kept, audit) = Pipeline.transformAudited(docs, c, "doc_id")
    val plain = Pipeline.transform(docs, c)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      plain.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq,
      "audit must not change what survives")
    val byStage = audit.groupBy("dropped_by").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every input row is either kept or attributed to exactly one stage
    assert(byStage.values.sum + kept.count() == docs.count())
    assert(audit.select("doc_id").distinct().count() == audit.count())
    // a terminal reshape loses the row identity: refuse, don't mis-audit
    // (transitionMatrix output is (from_type, to_type, n) — no doc_id;
    // the guard must fire at PLAN time, before any job runs)
    val reshape = cfg(
      """transforms: transitionMatrix
        |transform.transitionMatrix.keyColumn: source
        |transform.transitionMatrix.tsColumn: doc_id
        |transform.transitionMatrix.typeColumn: lang
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      Pipeline.transformAudited(docs, reshape, "doc_id"))
    assert(e.getMessage.contains("preserve column"))
  }
}
