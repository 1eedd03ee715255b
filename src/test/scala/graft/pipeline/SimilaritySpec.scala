package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings").cache()

  /** Local ground truth: cosine in plain Scala doubles. */
  private lazy val vectors: Map[Long, Array[Double]] =
    emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def trueTopK(q: Long, k: Int): Seq[Long] =
    vectors.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, cos(vectors(q), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)

  test("bruteForceTopK matches local ground truth exactly") {
    val got = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    (0L until 5L).foreach { q =>
      assert(got(q) == trueTopK(q, 5), s"query $q")
    }
  }

  test("int8TopK matches a local integer-code replica exactly and tracks float ranking") {
    val s = vectors.values.flatten.map(math.abs).max
    def code(v: Array[Double]): Array[Long] = v.map(x =>
      new java.math.BigDecimal(x * 127.0 / s)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
    val codes = vectors.view.mapValues(code).toMap
    val queries = vectors.keys.filter(_ % 50 == 0).toSeq.sorted
    val expected = queries.map { q =>
      q -> vectors.keys.filter(_ != q).toSeq
        .map(n => (n, codes(q).zip(codes(n)).map { case (a, b) => a * b }.sum))
        .sortBy { case (n, d) => (-d, n) }.take(5)
    }.toMap
    val got = Similarity.int8TopK(
      emb.filter(pmod(col("vec_id"), lit(50)) === 0), emb,
      "vec_id", "embedding", k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getLong(3))).toSeq).toMap
    queries.foreach { q => assert(got(q) == expected(q), s"query $q") }
    // quantization keeps retrieval useful: rank-1 int8 neighbor sits in
    // the float top-5 for most queries (9-bit-per-coord headroom)
    val floatTop = queries.map(q => q -> trueTopK(q, 5).toSet).toMap
    val hits = queries.count(q => floatTop(q).contains(got(q).head._1))
    assert(hits >= queries.size * 8 / 10, s"$hits/${queries.size}")
  }

  test("contrastivePairs: exclusive roles, exact counts, local replica of every pair") {
    val got = Similarity.contrastivePairs(
      emb.filter(pmod(col("vec_id"), lit(100)) === 0), emb,
      "vec_id", "embedding", kPos = 2, kNeg = 2, hardFrom = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val anchors = vectors.keys.filter(_ % 100 == 0).toSeq.sorted
    // per anchor: exactly 2 pos + 2 hard + 2 rand, all distinct others
    anchors.foreach { an =>
      val rows = got.filter(_._1 == an)
      assert(rows.count(_._3 == "pos") == 2 && rows.count(_._3 == "hard_neg") == 2
        && rows.count(_._3 == "rand_neg") == 2, s"anchor $an: $rows")
      assert(rows.map(_._2).distinct.length == rows.length)
    }
    // local replica: rebuild the whole pair set in plain Scala
    val s = vectors.values.flatten.map(math.abs).max
    def code(v: Array[Double]): Array[Long] = v.map(x =>
      new java.math.BigDecimal(x * 127.0 / s)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
    val codes = vectors.view.mapValues(code).toMap
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = anchors.flatMap { an =>
      val ranked = vectors.keys.filter(_ != an).toSeq
        .map(o => (o, codes(an).zip(codes(o)).map { case (x, y) => x * y }.sum))
        .sortBy { case (o, d) => (-d, o) }.zipWithIndex
        .map { case ((o, _), i) => (o, i + 1) }
      val pos = ranked.filter(_._2 <= 2).map { case (o, r) => (an, o, "pos", r.toLong) }
      val hard = ranked.filter(r => r._2 >= 20 && r._2 < 22)
        .map { case (o, r) => (an, o, "hard_neg", r.toLong) }
      val taken = (pos ++ hard).map(_._2).toSet
      val rand = ranked.map(_._1).filterNot(taken)
        .sortBy(o => (md5hex(s"$an#$o"), o)).take(2).zipWithIndex
        .map { case (o, i) => (an, o, "rand_neg", (i + 1).toLong) }
      pos ++ hard ++ rand
    }.toSet
    assert(got.toSet == expected)
  }

  test("knnEval: clustered embeddings classify perfectly; random labels stay mechanical") {
    val spark2 = spark
    import spark2.implicits._
    // 3 tight clusters on distinct axes; label = cluster -> 5-NN majority
    // must recover every label (within-cluster idot >> cross-cluster 0)
    val clustered = (0 until 30).map { i =>
      val lab = i % 3
      val v = Array.fill(4)(0.0f); v(lab) = 1.0f + (i / 3) * 0.001f
      (i.toLong, v.toSeq, lab)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnEval(clustered, clustered, "vec_id", "embedding",
      "label", k = 5).collect()
    assert(got.length == 30)
    assert(got.forall(_.getLong(4) == 1L), "clustered eval must be 100% correct")
    assert(got.forall(_.getLong(3) == 5L), "all 5 votes come from the cluster")
    // on the shared fixture: one row per query, vote counts in [1, k],
    // pred_label drawn from the label domain
    val emb20 = emb.filter(pmod(col("vec_id"), lit(20)) === 0)
    val fix = Similarity.knnEval(emb20, emb, "vec_id", "embedding", "label", k = 5)
      .collect()
    assert(fix.length == emb20.count())
    assert(fix.forall(r => r.getLong(3) >= 1L && r.getLong(3) <= 5L))
    val labels = emb.select(col("label").cast("long")).as[Long].collect().toSet
    assert(fix.forall(r => labels.contains(r.getLong(2))))
  }

  test("semanticDecontaminate: integer-dot threshold, schema preserved") {
    val spark2 = spark
    import spark2.implicits._
    // scale = 1.0 -> codes: (127,0), (126,13), (0,127)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f), "m1"),   // dot vs ref = 127*127 = 16129
      (2L, Seq(0.99f, 0.1f), "m2"),  // dot = 126*127 = 16002
      (3L, Seq(0.0f, 1.0f), "m3")    // dot = 0
    ).toDF("vec_id", "embedding", "meta")
    val ref = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("embedding")
    val strict = Similarity.semanticDecontaminate(corpus, ref, "embedding", 16100L)
    assert(strict.columns.toSeq == corpus.columns.toSeq)
    assert(strict.select("vec_id").as[Long].collect().toSet == Set(2L, 3L))
    // looser threshold also catches the semantic near-dup
    assert(Similarity.semanticDecontaminate(corpus, ref, "embedding", 16000L)
      .select("vec_id").as[Long].collect().toSet == Set(3L))
    // all-zero corpus: scale 0 -> all codes 0 -> nothing reaches minDot 1
    val zeros = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.semanticDecontaminate(zeros, ref, "embedding", 1L)
      .count() == 2L)
  }

  test("a zero-norm vector never appears as a neighbor (NaN orders largest in Spark)") {
    import spark.implicits._
    val withZero = emb.select("vec_id", "embedding").limit(50)
      .union(Seq((9999L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val top = Similarity.bruteForceTopK(
      withZero.filter(col("vec_id") < 3), withZero, "vec_id", "embedding", k = 5)
      .select("neighbor_id").collect().map(_.getLong(0))
    assert(!top.contains(9999L))
    val pairs = Similarity.cosinePairs(withZero, "vec_id", "embedding", threshold = 0.0)
      .filter(col("id_a") === 9999L || col("id_b") === 9999L)
    assert(pairs.isEmpty) // NaN must not pass any threshold
  }

  test("lshTopK achieves reasonable recall@5 against brute force") {
    val planes = Similarity.hyperplanes(120, 64)
    val got = Similarity.lshTopK(
      emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5, planes, bandBits = 6)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = (0L until 20L).map { q =>
      val truth = trueTopK(q, 5).toSet
      val found = got.getOrElse(q, Set.empty)
      (truth & found).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 20 bands x 6 bits: a cos≈0.5 neighbor matches some band with
    // P ≈ 1-(1-(2/3)^6)^20 ≈ 0.85; uncorrelated vectors at ~1/64 per band
    assert(mean >= 0.5, s"mean recall@5 = $mean")
  }

  test("cosinePairs finds same-cluster near-duplicates only above threshold") {
    val pairs = Similarity.cosinePairs(emb.limit(100), "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs.foreach { case (a, b, c) =>
      val expected = cos(vectors(a), vectors(b))
      assert(math.abs(c - expected) < 1e-9)
      assert(c >= 0.95)
    }
  }

  test("int8 quantization: half-step round trip, constants, cosine preserved") {
    val qv = Similarity.quantizeInt8(col("embedding"))
    val rows = emb.select(col("vec_id"), col("embedding"), qv.as("qv"))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), Similarity.dequantizeInt8(col("qv")),
          (x, y) => abs(x.cast("double") - y)), lit(0.0), (a, b) => greatest(a, b))
          .as("max_err"),
        ((col("qv.mx") - col("qv.mn")) / 255.0 / 2.0).as("half_step"),
        Similarity.cosineHof(col("embedding"),
          Similarity.dequantizeInt8(col("qv"))).as("self_cos"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) + 1e-12, s"vec ${r.getLong(0)}")
      assert(r.getDouble(3) > 0.999, s"vec ${r.getLong(0)}: cosine degraded")
    }
    // constant vector: codes all zero, dequantizes to the constant
    val const = spark.range(1).select(
      Similarity.quantizeInt8(array(lit(2.5f), lit(2.5f), lit(2.5f))).as("qv"))
      .select(col("qv.q").as("q"),
        Similarity.dequantizeInt8(col("qv")).as("back"))
      .collect().head
    assert(const.getSeq[Int](0).forall(_ == 0))
    assert(const.getSeq[Double](1).forall(_ == 2.5))
  }

  test("dot/norm expressions agree with Scala math") {
    val row = emb.filter(col("vec_id") === 0)
      .select(Similarity.dot(col("embedding"), col("embedding")).as("d"),
        Similarity.norm(col("embedding")).as("n"))
      .collect().head
    val v = vectors(0L)
    val dd = v.map(x => x * x).sum
    assert(math.abs(row.getDouble(0) - dd) < 1e-9)
    assert(math.abs(row.getDouble(1) - math.sqrt(dd)) < 1e-9)
  }

  test("randomProject: exact signed sums, deterministic, JL-reasonable") {
    val planes = Similarity.hyperplanes(numPlanes = 16, dim = 64, seed = 7L)
    val got = emb.select(col("vec_id"),
        Similarity.randomProject(col("embedding"), planes).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // exactness: left-to-right ±x sums in plain Scala doubles must be
    // BIT-identical (the property the oracle parity rests on)
    for (id <- Seq(0L, 1L, 7L)) {
      val v = vectors(id)
      val expect = planes.map(p => v.indices.foldLeft(0.0)((acc, i) => acc + v(i) * p(i)))
      assert(got(id) == expect.toSeq, s"vec $id projection not exact")
    }
    // JL sanity on the real corpus: projected distance correlates with
    // the original (scaled by 1/sqrt(planes)); just require positive
    // correlation rank-wise for one probe against two references
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val near = vectors.toSeq.filter(_._1 != 0L)
      .minBy { case (_, v) => d2(vectors(0L).toSeq, v.toSeq) }._1
    val far = vectors.toSeq.filter(_._1 != 0L)
      .maxBy { case (_, v) => d2(vectors(0L).toSeq, v.toSeq) }._1
    assert(d2(got(0L), got(near)) < d2(got(0L), got(far)),
      "projection inverted the nearest/farthest ordering for probe 0")
  }

  test("semanticDedup: identical vectors drop, kept/dropped is a partition") {
    import spark.implicits._
    // 1 and 2 are exact copies of 0 (cos = 1, share every bucket);
    // 3 is orthogonal to them
    val rows = Seq(
      (0L, Array.fill(8)(1.0f) ++ Array.fill(56)(0.0f)),
      (1L, Array.fill(8)(1.0f) ++ Array.fill(56)(0.0f)),
      (2L, Array.fill(8)(1.0f) ++ Array.fill(56)(0.0f)),
      (3L, Array.fill(8)(0.0f) ++ Array.fill(8)(1.0f) ++ Array.fill(48)(0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val planes = Similarity.hyperplanes(numPlanes = 80, dim = 64)
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
        planes, bandBits = 4, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(0L) == ((true, -1L)))
    assert(got(1L) == ((false, 0L)))
    assert(got(2L) == ((false, 0L))) // min earlier neighbor, not 1
    assert(got(3L)._1, "orthogonal vector must be kept")
    assert(got.size == 4)
  }

  test("semanticDedup and bm25 reject reserved-name collisions eagerly") {
    import spark.implicits._
    val planes = Similarity.hyperplanes(numPlanes = 8, dim = 2)
    val bad = Seq((1L, Array(1.0f, 0.0f), true))
      .toDF("vec_id", "embedding", "is_kept")
    assert(intercept[IllegalArgumentException](
      Similarity.semanticDedup(bad, "vec_id", "embedding", planes, 4, 0.9))
      .getMessage.contains("is_kept"))
    val badText = Seq((1L, "a", 2.0)).toDF("doc_id", "text", "score")
    assert(intercept[IllegalArgumentException](
      Text.bm25(badText, "text", "doc_id", Seq("a")))
      .getMessage.contains("score"))
    assert(intercept[IllegalArgumentException](
      Text.unigramStats(Seq(("a", "b")).toDF("term", "text"), "text", "term",
        Seq(("a", 1L)).toDF("term", "term_freq_total")))
      .getMessage.contains("term"))
  }

  test("semanticDedup degenerate inputs: zero-norm and null vectors are kept, never dropped") {
    import spark.implicits._
    val rows = Seq(
      (0L, Some(Array.fill(8)(1.0f) ++ Array.fill(56)(0.0f))),
      (1L, Some(Array.fill(8)(1.0f) ++ Array.fill(56)(0.0f))), // dup of 0
      (2L, Some(Array.fill(64)(0.0f))),                        // zero norm: cosine NaN
      (3L, None))                                              // null embedding
    val df = rows.toDF("vec_id", "embedding")
    val planes = Similarity.hyperplanes(numPlanes = 80, dim = 64)
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
        planes, bandBits = 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // one row per input id, including the degenerate ones
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(!got(1L), "true duplicate must still drop")
    // a zero-norm vector shares every bucket with everything (all dots
    // are 0 -> same codes) but its cosine is NaN — the guard must keep
    // it rather than let Spark's NaN-orders-largest pass the threshold
    assert(got(2L), "zero-norm vector must be kept (NaN cosine)")
    assert(got(3L), "null embedding must be kept (never bucketed)")
  }

  test("semanticDedup on the corpus: every drop is justified by exact cosine") {
    val planes = Similarity.hyperplanes(numPlanes = 80, dim = 64)
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        planes, bandBits = 4, threshold = 0.35)
      .collect()
    assert(out.length == vectors.size)
    val dropped = out.filter(!_.getBoolean(1))
    assert(dropped.nonEmpty, "threshold 0.35 must drop something on this corpus")
    dropped.foreach { r =>
      val (id, dupOf) = (r.getLong(0), r.getLong(2))
      assert(dupOf < id, s"dup_of must be an EARLIER id: $id -> $dupOf")
      assert(cos(vectors(id), vectors(dupOf)) >= 0.35 - 1e-12,
        s"drop $id -> $dupOf not justified by exact cosine")
    }
  }
}
