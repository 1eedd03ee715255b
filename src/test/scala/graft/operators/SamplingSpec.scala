package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sample is deterministic under repartitioning (unlike df.sample)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id")
    val a = Sampling.deterministicSample(docs, "doc_id", 1, 10)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 1, 10)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // rate lands near 10% (md5 buckets are uniform-ish)
    val n = docs.count()
    assert(a.size > n / 20 && a.size < n / 5, s"${a.size} of $n")
  }

  test("splits are disjoint, exhaustive, and nested rates compose") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id")
    val split = Sampling.split(docs, "doc_id", Seq("train" -> 16, "val" -> 2, "test" -> 2), 20)
    assert(split.count() == docs.count()) // exhaustive
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    // a 16/20 sample is exactly the train split (prefix ranges compose)
    val sampled = Sampling.deterministicSample(docs, "doc_id", 16, 20)
      .collect().map(_.getLong(0)).toSet
    val train = split.filter(col("split") === "train")
      .collect().map(_.getLong(0)).toSet
    assert(sampled == train)
  }

  test("null keys are treated consistently by sample and split") {
    import spark.implicits._
    val df = Seq(Option(1L), Option(2L), Option.empty[Long]).toDF("k")
    // full-rate sample keeps everything, including the null-key row
    assert(Sampling.deterministicSample(df, "k", 20, 20).count() == 3)
    // split labels every row, null keys deterministically
    val s = Sampling.split(df, "k", Seq("a" -> 10, "b" -> 10), 20)
    assert(s.count() == 3 && s.filter(col("split").isNull).count() == 0)
  }

  test("fraction validation") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id")
    assertThrows[IllegalArgumentException](
      Sampling.split(docs, "doc_id", Seq("a" -> 15, "b" -> 10), 20))
    assertThrows[IllegalArgumentException](
      Sampling.deterministicSample(docs, "doc_id", 11, 10))
  }

  test("resampleByWeight: per-row rates honored, clamped, and consistent with the global form") {
    import spark.implicits._
    val n = 2000
    // weight column drives the rate: 0 keeps nothing, denom keeps all
    val zero = (1 to n).map(i => (i.toLong, 0L)).toDF("id", "w")
    assert(Sampling.resampleByWeight(zero, "id", "w", 1000).count() == 0)
    val full = (1 to n).map(i => (i.toLong, 1000L)).toDF("id", "w")
    assert(Sampling.resampleByWeight(full, "id", "w", 1000).count() == n)
    // out-of-range weights clamp instead of corrupting the filter
    val wild = (1 to n).map(i => (i.toLong, if (i % 2 == 0) -50L else 99999L)).toDF("id", "w")
    val keptWild = Sampling.resampleByWeight(wild, "id", "w", 1000)
      .select("id").as[Long].collect().toSet
    assert(keptWild == (1 to n).filter(_ % 2 == 1).map(_.toLong).toSet)
    // a CONSTANT weight equals the single-rate deterministicSample cut
    val const = (1 to n).map(i => (i.toLong, 250L)).toDF("id", "w")
    val viaWeight = Sampling.resampleByWeight(const, "id", "w", 1000)
      .select("id").as[Long].collect().toSet
    val viaGlobal = Sampling.deterministicSample(const, "id", 250, 1000)
      .select("id").as[Long].collect().toSet
    assert(viaWeight == viaGlobal)
    // and the realized rate lands near the requested 25%
    assert(math.abs(viaWeight.size / n.toDouble - 0.25) < 0.05)
    // membership is layout-independent: same kept set after repartition
    val reKept = Sampling.resampleByWeight(const.repartition(13), "id", "w", 1000)
      .select("id").as[Long].collect().toSet
    assert(reKept == viaWeight)
  }

  test("stratified sample applies per-stratum rates over one bucket space") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 2), defaultNum = 5, denom = 10)
    // each stratum's kept set equals filtering that stratum at its rate
    for ((lang, num) <- Seq(("en", 2), ("fr", 5))) {
      val expect = Sampling.deterministicSample(
        docs.filter(col("lang") === lang), "doc_id", num, 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val kept = got.filter(col("lang") === lang)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == expect, s"stratum $lang")
    }
    assertThrows[IllegalArgumentException](
      Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 11), 5, 10))
  }

  test("sqrt temperature sampling: per-group rate is floor(denom·scale/√n)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val denom = 10000
    val got = Sampling.sqrtTemperatureSample(docs, "doc_id", "lang",
      scale = 5.0, denom = denom)
    // membership must equal the directly-computed bucket-vs-rate test
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = docs.collect().filter { r =>
      val rate = math.min(denom.toLong,
        math.floor(denom * 5.0 / math.sqrt(counts(r.getString(2)).toDouble)).toLong)
      // replicate bucketOf locally: first 15 md5 hex chars mod denom
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getLong(0).toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % denom < rate
    }.map(_.getLong(0)).toSet
    assert(got.collect().map(_.getAs[Long]("doc_id")).toSet == expect)
    // rebalancing direction: the dominant group keeps a SMALLER fraction
    val fracs = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / counts(r.getString(0)))
      .toMap
    val (big, small) = (counts.maxBy(_._2)._1, counts.minBy(_._2)._1)
    assert(fracs(big) < fracs(small))
    assertThrows[IllegalArgumentException](
      Sampling.sqrtTemperatureSample(docs, "doc_id", "lang", scale = 0.0))
  }

  test("sqrt temperature sampling keeps NULL-group rows at their own rate") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .withColumn("lang", when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("lang")))
    val got = Sampling.sqrtTemperatureSample(docs, "doc_id", "lang", scale = 5.0)
    // the NULL group participates: same membership as filtering it directly
    val nullKept = got.filter(col("lang").isNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nullGroup = docs.filter(col("lang").isNull)
    val n = nullGroup.count()
    val rate = math.min(10000L, math.floor(10000 * 5.0 / math.sqrt(n.toDouble)).toLong)
    val expect = nullGroup.filter(
      Sampling.bucketOf(col("doc_id"), 10000) < rate)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nullKept == expect && nullKept.nonEmpty)
  }

  test("capPerGroup is row-identical to the single-window form") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val rankBy = Seq(md5(col("text").cast("binary")), col("doc_id"))
    for (shards <- Seq(1, 3, 16)) {
      val got = Sampling.capPerGroup(docs, Seq("source"), rankBy, k = 7,
          shards = shards, rankName = "r")
        .select(col("doc_id"), col("r"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val w = Window.partitionBy(col("source")).orderBy(rankBy.map(_.asc): _*)
      val expect = docs.withColumn("r", row_number().over(w).cast("long"))
        .filter(col("r") <= 7).select(col("doc_id"), col("r"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == expect, s"shards=$shards")
    }
  }

  test("capPerGroup caps and ranks within every group") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val got = Sampling.capPerGroup(docs, Seq("source"),
      Seq(md5(col("text").cast("binary")), col("doc_id")), k = 10)
    val perGroup = got.groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("rank_in_group")).as("mx"))
      .collect()
    assert(perGroup.nonEmpty)
    perGroup.foreach { r =>
      assert(r.getLong(1) <= 10 && r.getLong(2) == r.getLong(1))
    }
    assertThrows[IllegalArgumentException](
      Sampling.capPerGroup(docs, Seq("source"), Seq(col("doc_id")), k = 0))
    // reserved internal / output names are rejected, not overwritten
    assertThrows[IllegalArgumentException](
      Sampling.capPerGroup(docs.withColumn("__shard_rank", lit(1)),
        Seq("source"), Seq(col("doc_id")), k = 1))
    assertThrows[IllegalArgumentException](
      Sampling.capPerGroup(docs.withColumn("r", lit(1)),
        Seq("source"), Seq(col("doc_id")), k = 1, rankName = "r"))
  }

  test("mixToTarget hits the target mixture and drops unweighted groups") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val weights = Map("en" -> 5, "de" -> 2, "fr" -> 2, "zh" -> 1)
    val kept = Sampling.mixToTarget(docs, "doc_id", "lang", weights, wDenom = 10)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unweighted groups are not in the target mix
    assert(!byLang.contains("es"))
    assert(byLang.keySet == weights.keySet)
    // exact integer quotas: T = min_s floor(n_s*10/w_s), quota_s = floor(w_s*T/10);
    // hash-mod thinning hits quotas in expectation — allow binomial slack
    val n = docs.filter(col("lang").isin(weights.keySet.toSeq: _*))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tMax = weights.map { case (g, w) => n(g) * 10 / w }.min
    weights.foreach { case (g, w) =>
      val quota = w * tMax / 10
      val got = byLang(g)
      val slack = math.max(4.0, 3 * math.sqrt(quota.toDouble))
      assert(math.abs(got - quota) <= slack, s"$g: kept $got, quota $quota")
    }
    // membership is a pure function of the key: repartitioning changes nothing
    val again = Sampling.mixToTarget(docs.repartition(7), "doc_id", "lang",
      weights, wDenom = 10).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == kept.collect().map(_.getAs[Long]("doc_id")).toSet)
    // kept set is a subset of the input
    assert(kept.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    assertThrows[IllegalArgumentException](
      Sampling.mixToTarget(docs, "doc_id", "lang", Map("en" -> 11), wDenom = 10))
    assertThrows[IllegalArgumentException](
      Sampling.mixToTarget(docs, "doc_id", "lang", Map("en" -> 0), wDenom = 10))
  }

  test("tokenBudget: sharded plan is row-identical to the single-window form") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "lang", "n_chars")
    def ids(shards: Int, budget: Long) =
      Sampling.tokenBudget(docs, "lang", "doc_id", "n_chars", budget, shards)
        .collect().map(_.getLong(0)).toSet
    val naive = ids(1, 20000L)
    val sharded = ids(256, 20000L)
    assert(naive == sharded && naive.nonEmpty)
    // budget respected per group, and the NEXT doc in hash order would bust it
    val kept = Sampling.tokenBudget(docs, "lang", "doc_id", "n_chars", 20000L)
    kept.groupBy("lang").agg(sum("n_chars").as("s")).collect()
      .foreach(r => assert(r.getLong(1) <= 20000L, s"${r.getString(0)} over budget"))
    assert(kept.count() < docs.count())
    // nested samples: a bigger budget only ever adds documents
    assert(naive.subsetOf(ids(256, 40000L)))
    // deterministic under repartitioning
    val repart = Sampling.tokenBudget(docs.repartition(7), "lang", "doc_id",
      "n_chars", 20000L).collect().map(_.getLong(0)).toSet
    assert(repart == naive)
    // schema preserved
    assert(kept.columns.toSeq == docs.columns.toSeq)
  }

  test("tokenBudget: first doc over budget keeps nothing; clamps and validation") {
    import spark.implicits._
    val tiny = Seq((1L, "g", 500L), (2L, "g", 600L)).toDF("id", "grp", "tok")
    assert(Sampling.tokenBudget(tiny, "grp", "id", "tok", 100L).count() == 0)
    // null/negative token counts clamp to 0 and never block the budget
    val weird = Seq((1L, "g", Some(-5L)), (2L, "g", None), (3L, "g", Some(10L)))
      .toDF("id", "grp", "tok")
    assert(Sampling.tokenBudget(weird, "grp", "id", "tok", 10L).count() == 3)
    assertThrows[IllegalArgumentException](
      Sampling.tokenBudget(tiny, "grp", "id", "tok", 0L))
    assertThrows[IllegalArgumentException](
      Sampling.tokenBudget(tiny, "grp", "id", "tok", 10L, shards = 3))
  }
}
