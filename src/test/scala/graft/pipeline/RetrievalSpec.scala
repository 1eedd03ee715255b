package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** RRF fusion: hand-checkable scores, missing-tier nulls, tie-break
  * determinism, and the k cap.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lex = Seq(
    ("q0", 10L, 1L), ("q0", 20L, 2L), ("q0", 30L, 3L),
    ("q1", 10L, 1L)).toDF("qid", "id", "rank")
  private val dense = Seq(
    ("q0", 20L, 1L), ("q0", 40L, 2L),
    ("q1", 50L, 1L)).toDF("qid", "id", "rank")

  test("fused scores are the exact two-division sums; both-tier docs rank first") {
    val got = Retrieval.rrfFuse(lex, dense, "qid", "id", k = 10)
      .orderBy("qid", "rank")
      .as[(String, Long, Long, Option[Long], Option[Long], Double)].collect().toSeq
    // q0: doc 20 in both tiers (lex rank 2, dense rank 1)
    assert(got.head === (("q0", 1L, 20L, Some(2L), Some(1L), 1.0 / 62 + 1.0 / 61)))
    // doc 10 lex-only rank 1, doc 40 dense-only rank 2, doc 30 lex rank 3
    assert(got(1) === (("q0", 2L, 10L, Some(1L), None, 1.0 / 61)))
    assert(got(2) === (("q0", 3L, 40L, None, Some(2L), 1.0 / 62)))
    assert(got(3) === (("q0", 4L, 30L, Some(3L), None, 1.0 / 63)))
    // q1: disjoint hits, equal scores -> id ascending breaks the tie
    assert(got(4) === (("q1", 1L, 10L, Some(1L), None, 1.0 / 61)))
    assert(got(5) === (("q1", 2L, 50L, None, Some(1L), 1.0 / 61)))
  }

  test("k caps each query's fused list") {
    val got = Retrieval.rrfFuse(lex, dense, "qid", "id", k = 2)
    assert(got.groupBy("qid").count().collect().map(_.getLong(1)).forall(_ <= 2))
    assert(got.count() === 4)
  }

  test("kRrf shifts the discount") {
    val got = Retrieval.rrfFuse(lex, dense, "qid", "id", k = 10, kRrf = 0)
      .filter($"qid" === "q0" && $"id" === 20L)
      .select("rrf_score").as[Double].head()
    assert(got === 1.0 / 2 + 1.0 / 1)
  }

  // axis-aligned candidate vectors make every cosine 0 or 1: the MMR
  // trace is hand-computable exactly
  private def mmrCands = Seq(
    // q0: docs 1,2 identical direction (cos 1), doc 3 orthogonal.
    // rels: 1 -> 0.9, 2 -> 0.8, 3 -> 0.5
    ("q0", 1L, 0.9, Seq(1.0f, 0.0f, 0.0f)),
    ("q0", 2L, 0.8, Seq(2.0f, 0.0f, 0.0f)),
    ("q0", 3L, 0.5, Seq(0.0f, 1.0f, 0.0f)),
    // q1: a single candidate — ranks stop at 1
    ("q1", 7L, 0.4, Seq(0.0f, 0.0f, 1.0f))
  ).toDF("qid", "id", "rel", "vec")

  test("mmr: the diversity term demotes a near-duplicate of the first pick") {
    val got = Retrieval.mmrRerank(mmrCands, "qid", "id", "rel", "vec",
        k = 3, lambdaPct = 70)
      .orderBy("qid", "rank")
      .as[(String, Int, Long, Double)].collect().toSeq
    // q0 rank 1: doc 1 (top rel, score 0.7*0.9). rank 2: doc 2 scores
    // 0.7*0.8 - 0.3*1 = 0.26 < doc 3's 0.7*0.5 - 0.3*0 = 0.35 -> doc 3.
    // rank 3: doc 2 (last one standing).
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("q0", 1, 1L), ("q0", 2, 3L), ("q0", 3, 2L), ("q1", 1, 7L)))
    // scores are the exact fixed-order double arithmetic
    assert(math.abs(got.head._4 - (70 * 0.9 / 100 - 30 * 0.0 / 100)) == 0.0)
    assert(math.abs(got(1)._4 - (70 * 0.5 / 100 - 30 * 0.0 / 100)) == 0.0)
    assert(math.abs(got(2)._4 - (70 * 0.8 / 100 - 30 * 1.0 / 100)) < 1e-15)
  }

  test("evalRanking: hand-checked recall/MRR/AP/NDCG, zero-hit and cutoff cases") {
    val results = Seq(
      ("q0", 10L, 1L), ("q0", 11L, 2L), ("q0", 12L, 3L), ("q0", 13L, 4L),
      ("q1", 20L, 1L), ("q1", 21L, 2L),
      // q2's only relevant hit sits past the cutoff — must not count
      ("q2", 30L, 11L)
    ).toDF("qid", "id", "rank")
    val truth = Seq(
      ("q0", 11L), ("q0", 13L), ("q0", 99L),
      ("q1", 77L),
      ("q2", 30L)
    ).toDF("qid", "id")
    val got = Retrieval.evalRanking(results, truth, "qid", "id", "rank", k = 10)
      .orderBy("qid")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    def disc(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    // q0: hits at ranks 2 and 4 of 3 relevant
    val (_, nRel0, nHits0, rec0, mrr0, ap0, ndcg0) = got(0)
    assert(nRel0 == 3L && nHits0 == 2L)
    assert(rec0 == 2.0 / 3.0)
    assert(mrr0 == 0.5)
    assert(ap0 == (1.0 / 2.0 + 2.0 / 4.0) / 3.0)
    assert(ndcg0 == (disc(2) + disc(4)) / (disc(1) + disc(2) + disc(3)))
    // q1: judged but no hits — all metrics zero, n_rel preserved
    assert(got(1) == (("q1", 1L, 0L, 0.0, 0.0, 0.0, 0.0)))
    // q2: the rank-11 hit is outside k=10
    assert(got(2) == (("q2", 1L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("evalRanking graded: exponential gains, ideal ordering, binary-equivalence at rel=1") {
    val results = Seq(
      ("q0", 10L, 1L), ("q0", 11L, 2L), ("q0", 12L, 3L)
    ).toDF("qid", "id", "rank")
    // the LOW-graded doc is ranked first: DCG pays for the misorder
    val truth = Seq(("q0", 10L, 1L), ("q0", 11L, 3L)).toDF("qid", "id", "rel")
    val got = Retrieval.evalRanking(results, truth, "qid", "id", "rank",
        k = 10, relCol = Some("rel"))
      .as[(String, Long, Long, Double, Double, Double, Double)].head()
    def disc(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    def gain(rel: Int) = (1L << rel) - 1.0
    val dcg = gain(1) * disc(1) + gain(3) * disc(2)
    val idcg = gain(3) * disc(1) + gain(1) * disc(2)
    assert(got._7 == dcg / idcg)
    assert(got._7 < 1.0, "misordered grades must cost NDCG")
    // binary metrics unaffected by grades
    assert(got._4 == 1.0 && got._5 == 1.0)
    // rel = 1 everywhere reduces the graded path to the binary one
    val bin = Retrieval.evalRanking(results,
      truth.withColumn("rel", org.apache.spark.sql.functions.lit(1L)),
      "qid", "id", "rank", k = 10, relCol = Some("rel"))
    val noRel = Retrieval.evalRanking(results, truth.drop("rel"),
      "qid", "id", "rank", k = 10)
    assert(bin.collect().toSeq == noRel.collect().toSeq)
  }

  test("evalRanking rejects out-of-envelope grades loudly") {
    val results = Seq(("q0", 10L, 1L)).toDF("qid", "id", "rank")
    // rel = 63 would shift into the sign bit (negative gain), rel = 0
    // and null are outside the documented >= 1 contract — all three
    // must fail the job, never produce silently-garbage NDCG
    for (bad <- Seq[Option[Long]](Some(63L), Some(0L), None)) {
      val truth = Seq(("q0", 10L, bad)).toDF("qid", "id", "rel")
      val e = intercept[Exception] {
        Retrieval.evalRanking(results, truth, "qid", "id", "rank",
          k = 10, relCol = Some("rel")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("must be in [1, 31]")),
        s"grade $bad: wrong failure ${e.getMessage}")
    }
    // the boundary grades pass
    val ok = Retrieval.evalRanking(results,
      Seq(("q0", 10L, 31L), ("q0", 11L, 1L)).toDF("qid", "id", "rel"),
      "qid", "id", "rank", k = 10, relCol = Some("rel")).collect()
    assert(ok.length === 1)
  }

  test("mmr: lambdaPct = 100 reduces to pure relevance order") {
    val got = Retrieval.mmrRerank(mmrCands, "qid", "id", "rel", "vec",
        k = 3, lambdaPct = 100)
      .filter($"qid" === "q0").orderBy("rank")
      .as[(String, Int, Long, Double)].collect().map(_._3).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }
}
