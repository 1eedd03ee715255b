package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // The synthetic embeddings are ISOTROPIC (no cluster structure:
  // within-label and between-label cosine both ≈ 0) — the worst case
  // rate-distortion allows. m=16, ksub=16 spends 1 bit/dim, for which
  // theory predicts SSE/energy ≈ 2^(-2·1) = 0.25 on Gaussian data; the
  // bounds below are set against that, not against clusterable data.
  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings").cache()
  private lazy val model = Pq.train(emb, "vec_id", "embedding", m = 16, ksub = 16, iters = 2)

  private lazy val vectors: Map[Long, Array[Double]] =
    emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("training is deterministic and codebooks have the declared shape") {
    val again = Pq.train(emb, "vec_id", "embedding", m = 16, ksub = 16, iters = 2)
    assert(model.m == 16 && model.ksub == 16 && model.dsub == 4)
    def asSeq(cb: Array[Array[Array[Double]]]) =
      cb.map(_.map(_.toSeq).toSeq).toSeq
    assert(asSeq(model.codebooks) == asSeq(again.codebooks))
  }

  test("codes are the per-subspace argmin against the codebooks") {
    val got = emb.select(col("vec_id"),
        Pq.encode(col("embedding"), model).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (id <- Seq(0L, 1L, 13L, 99L)) {
      val v = vectors(id)
      val expect = (0 until model.m).map { j =>
        val sub = v.slice(j * model.dsub, (j + 1) * model.dsub)
        model.codebooks(j).zipWithIndex.minBy { case (c, i) => (d2(sub, c), i) }._2
      }
      assert(got(id) == expect, s"vec $id")
    }
  }

  test("reconstruction captures most of the corpus variance") {
    // PQ MSE must be well under the per-vector energy: quantizing to
    // 8 codes of 16 centroids should not destroy the geometry
    // two-step select: inlining encode inside decode squares the
    // expression tree (decode reads its input m×ksub times)
    val stats = emb
      .select(col("embedding"), Pq.encode(col("embedding"), model).as("codes"))
      .select(Pq.decode(col("codes"), model).as("r"), col("embedding"))
      .select(
        aggregate(zip_with(col("embedding"), col("r"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, v) => a + v).as("err"),
        aggregate(col("embedding"),
          lit(0.0), (a, v) => a + v.cast("double") * v.cast("double")).as("energy"))
      .agg(sum(col("err")).as("sse"), sum(col("energy")).as("se"))
      .collect().head
    val ratio = stats.getDouble(0) / stats.getDouble(1)
    // 1 bit/dim on isotropic data: theory ≈ 0.25, headroom for the
    // short Lloyd budget and non-Gaussian marginals
    assert(ratio < 0.45, s"PQ reconstruction lost too much: SSE/energy = $ratio")
  }

  test("adc top-k achieves reasonable recall against exact search") {
    val codes = emb.select(col("vec_id"), Pq.encode(col("embedding"), model).as("codes"))
    val queries = emb.filter(col("vec_id") < 20)
    val approx = Pq.adcTopK(queries, codes, "vec_id", "embedding", "codes", model, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // isotropic data is ANN's worst case (top-5 barely separated from
    // the bulk); 1-bit/dim ADC must still beat the 2% chance baseline
    // by an order of magnitude
    assert(recall >= 0.3, s"ADC recall@10-vs-exact@5 too low: $recall")
    // adc distances are non-negative and ranked ascending per query
    val rows = Pq.adcTopK(queries.limit(3), codes, "vec_id", "embedding", "codes", model, k = 5)
      .collect()
    assert(rows.forall(_.getDouble(3) >= 0.0))
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.sameElements(byRank.sorted))
    }
  }

  test("two-stage rerank: exact distances, recall repaired, full-kCand equals brute force") {
    val codes = emb.select(col("vec_id"), Pq.encode(col("embedding"), model).as("codes"))
    val queries = emb.filter(col("vec_id") < 20)
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val exactTop: Map[Long, Seq[Long]] = (0L until 20L).map { q =>
      q -> vectors.keys.filter(_ != q).toSeq
        .map(n => (sq(vectors(q), vectors(n)), n)).sorted.take(5).map(_._2)
    }.toMap

    // total candidate admission: the rerank IS brute-force exact L2
    val full = Pq.adcRerankTopK(queries, codes, emb, "vec_id", "embedding",
        "codes", model, k = 5, kCand = vectors.size)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(full == exactTop)

    // production kCand: distances are EXACT (quantization error can
    // only cost candidate admission, never order), and recall vs the
    // true top-5 is at least the plain ADC stage's
    val reranked = Pq.adcRerankTopK(queries, codes, emb, "vec_id", "embedding",
      "codes", model, k = 5, kCand = 25).collect()
    reranked.foreach { r =>
      val d = sq(vectors(r.getLong(0)), vectors(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - d) < 1e-9,
        s"rerank distance not exact for (${r.getLong(0)}, ${r.getLong(2)})")
    }
    val truth = exactTop.flatMap { case (q, ns) => ns.map(q -> _) }.toSet
    val rrHits = reranked.map(r => (r.getLong(0), r.getLong(2))).toSet
    val adcHits = Pq.adcTopK(queries, codes, "vec_id", "embedding", "codes", model, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rrRecall = truth.count(rrHits.contains).toDouble / truth.size
    val adcRecall = truth.count(adcHits.contains).toDouble / truth.size
    assert(rrRecall >= adcRecall,
      s"rerank recall $rrRecall below plain ADC recall $adcRecall")
  }

  test("rerankExact past the broadcast cap: shuffle fallback returns identical rankings") {
    val codes = emb.select(col("vec_id"), Pq.encode(col("embedding"), model).as("codes"))
    val queries = emb.filter(col("vec_id") < 5)
    val cand = Pq.adcTopK(queries, codes, "vec_id", "embedding", "codes", model, k = 10)
    def run(cap: Long) = Pq.rerankExact(cand, queries, emb, "vec_id", "embedding",
        k = 5, maxBroadcastRows = cap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    // cap 0 forces the non-broadcast plan (the oversized-batch path);
    // rows must be identical to the hinted plan
    assert(run(0L) == run(4000000L))
  }

  test("native encode kernel is bit-identical to the composed HOF form") {
    val native = emb.select(col("vec_id"), Pq.encode(col("embedding"), model).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = emb.select(col("vec_id"), Pq.encodeHof(col("embedding"), model).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native == hof)
  }

  test("ivf-pq composition: pruned ADC search over the persisted code index") {
    val ivf = Ivf.train(emb, "vec_id", "embedding", k = 10, iters = 2)
    // the persisted index: (id, bucket, codes) — no vectors at query time
    val indexedCodes = Ivf.index(emb, "vec_id", "embedding", ivf)
      .select(col("neighbor_id").as("vec_id"), col("bucket"))
      .join(emb.select(col("vec_id"),
        Pq.encode(col("embedding"), model).as("codes")), "vec_id")
    val queries = emb.filter(col("vec_id") < 10)
    val got = Pq.ivfAdcTopK(queries, indexedCodes, "vec_id", "embedding",
      "codes", "bucket", ivf, model, k = 5, nProbe = 4).collect()
    // shape: <= 5 ranked rows per query, distances ascending, no self
    assert(got.groupBy(_.getLong(0)).size == 10)
    got.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length <= 5)
      assert(!g.exists(r => r.getLong(0) == r.getLong(2)))
      val byRank = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.sameElements(byRank.sorted))
    }
    // pruning is real: every returned neighbor lives in one of the
    // query's nProbe probed buckets
    val bucketOf = indexedCodes.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = Ivf.probeBuckets(queries, "vec_id", "embedding", ivf, nProbe = 4)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getInt(2)).toSet }
    got.foreach { r =>
      assert(probed(r.getLong(0)).contains(bucketOf(r.getLong(2))),
        s"neighbor ${r.getLong(2)} outside query ${r.getLong(0)}'s probed buckets")
    }
  }

  test("train rejects a dimension that does not split into m subspaces") {
    import spark.implicits._
    val odd = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Pq.train(odd, "vec_id", "embedding", m = 2))
  }

  test("train fails loudly on an empty or too-small corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val eEmpty = intercept[IllegalArgumentException](
      Pq.train(empty, "vec_id", "embedding", m = 2, ksub = 4))
    assert(eEmpty.getMessage.contains("empty"))
    val tiny = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val eTiny = intercept[IllegalArgumentException](
      Pq.train(tiny, "vec_id", "embedding", m = 2, ksub = 4))
    assert(eTiny.getMessage.contains("ksub=4"))
  }

  test("wrong-typed input fails at analysis time, not mid-job") {
    import spark.implicits._
    val strings = Seq((1L, "not a vector")).toDF("id", "v")
    intercept[org.apache.spark.sql.AnalysisException](
      strings.select(Pq.encode(col("v"), model)).schema)
    intercept[org.apache.spark.sql.AnalysisException](
      strings.select(Pq.decode(col("v"), model)).schema)
    intercept[org.apache.spark.sql.AnalysisException](
      strings.select(graft.functions.PqExpressions.lut(col("v"), model.codebooks)).schema)
    // decode wants int codes specifically — a float vector is a mismatch
    val floats = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    intercept[org.apache.spark.sql.AnalysisException](
      floats.select(Pq.decode(col("v"), model)).schema)
  }

  test("PQ expressions compare structurally, not by codebook array identity") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types._
    val copy = Pq.Model(model.codebooks.map(_.map(_.clone())))
    val child = BoundReference(0, ArrayType(FloatType), nullable = false)
    val a = graft.functions.PqEncode(child, graft.functions.PqCodebooks(model.codebooks))
    val b = graft.functions.PqEncode(child, graft.functions.PqCodebooks(copy.codebooks))
    assert(a == b, "equal codebooks via distinct arrays must yield equal expressions")
    assert(a.semanticEquals(b))
    // ragged codebooks are rejected at construction
    val ragged = Array(
      Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      Array(Array(5.0, 6.0)))
    intercept[IllegalArgumentException](graft.functions.PqCodebooks(ragged))
  }
}
