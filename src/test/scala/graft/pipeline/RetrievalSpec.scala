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
}
