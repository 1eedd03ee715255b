package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property sweep: over randomized corpora and query batches, the
  * persisted index's hit lists equal [[Text.retrievalTopK]]'s — and a
  * randomly split create+appendEpoch build equals the single-shot
  * build. Small vocabulary on purpose (forces heavy term sharing,
  * ties, and multi-term matches — the ranking contract's hard cases).
  */
class LexIndexPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
  private val doc = Gen.choose(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val corpus = Gen.choose(2, 20).flatMap(n => Gen.listOfN(n, doc))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  private val queryBatch = Gen.choose(1, 3).flatMap(nq =>
    Gen.listOfN(nq, Gen.someOf(vocab).map(_.toList)).map(_.zipWithIndex.collect {
      case (terms, qi) if terms.nonEmpty => terms.map(t => (s"q$qi", t))
    }.flatten))

  private def hits(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("qid", "rank")
      .select(col("qid"), col("rank"), col("id"), col("n_matched"),
        col("sum_tf"), col("dl"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

  test("persisted search equals the in-plan retrieval join on random corpora") {
    check(Prop.forAll(corpus, queryBatch, Gen.choose(1, 6)) { (docs, qs, k) =>
      qs.isEmpty || {
        val c = docs.toDF("id", "text")
        val q = qs.toDF("qid", "term")
        val root = Files.createTempDirectory("lexprop").resolve("ix").toString
        LexIndex.create(c, "id", "text", root)
        val persisted = hits(LexIndex.search(spark, root, q, "qid", "term", k))
        val direct = hits(Text.retrievalTopK(c, "text", "id", q, "qid", "term", k))
        persisted == direct
      }
    })
  }

  test("split create+append equals the single-shot build") {
    check(Prop.forAll(corpus, queryBatch, Gen.choose(0, 19)) { (docs, qs, cut) =>
      qs.isEmpty || {
        val c = docs.toDF("id", "text")
        val base = Files.createTempDirectory("lexprop2")
        val whole = base.resolve("w").toString
        val split = base.resolve("s").toString
        LexIndex.create(c, "id", "text", whole)
        LexIndex.create(c.filter(col("id") < cut), "id", "text", split)
        LexIndex.appendEpoch(c, "id", "text", split, "e")
        val q = qs.toDF("qid", "term")
        hits(LexIndex.search(spark, whole, q, "qid", "term", 5)) ==
          hits(LexIndex.search(spark, split, q, "qid", "term", 5))
      }
    })
  }
}
