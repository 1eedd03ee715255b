package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Sub-document substring dedup (token-gram granularity): hand-built
  * ground truth plus the hashed-arm/raw-arm equivalence the oracle
  * relies on (the gate checks the raw-gram arm; production runs the
  * xxhash64 arm, which must be row-identical).
  */
class DupSpanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("dupGramProfile counts corpus-duplicated grams, short docs profile 0/0") {
    val d = df(
      1L -> "a b c d e f g h tail one",   // grams at pos 1..3; pos1 = a..h
      2L -> "a b c d e f g h tail two",   // shares pos-1 and pos-2 grams with 1
      3L -> "totally different words",    // 3 tokens < k → 0 grams
      4L -> "x x x x x x x x x")          // 2 identical grams within ONE doc
    val got = Dedup.dupGramProfile(d, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1/doc2: 3 grams each; "a..h" and "b..tail" duplicated across
    // docs (pos 1, 2), third gram ends in one/two → unique
    // doc4: both grams are "x x x x x x x x" → duplicated within-doc
    assert(got == Seq((1L, 3L, 2L), (2L, 3L, 2L), (3L, 0L, 0L), (4L, 2L, 2L)))
  }

  test("cutDupSpans drops covered tokens only, keeps row multiplicity") {
    val d = df(
      1L -> "a b c d e f g h tail one",
      2L -> "a b c d e f g h tail two",
      3L -> "short doc")
    val got = Dedup.cutDupSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    // dup grams at pos 1 and 2 cover tokens 1..9 → only token 10 survives
    assert(got == Seq(
      (1L, 10L, 1L, "one"),
      (2L, 10L, 1L, "two"),
      (3L, 2L, 2L, "short doc")))
  }

  test("hashed-gram arm is row-identical to the raw-text arm (oracle bridge)") {
    val profRaw = Dedup.dupGramProfile(docs, "doc_id", "text", k = 8,
      hashGrams = false).orderBy("doc_id").collect().toSeq
    val profHashed = Dedup.dupGramProfile(docs, "doc_id", "text", k = 8,
      hashGrams = true).orderBy("doc_id").collect().toSeq
    assert(profRaw == profHashed)
    val cutRaw = Dedup.cutDupSpans(docs, "doc_id", "text", k = 8,
      hashGrams = false).orderBy("doc_id").collect().toSeq
    val cutHashed = Dedup.cutDupSpans(docs, "doc_id", "text", k = 8,
      hashGrams = true).orderBy("doc_id").collect().toSeq
    assert(cutRaw == cutHashed)
    // and the profile is consistent with the cut: a doc loses tokens
    // iff it has duplicated grams
    val dupDocs = profRaw.filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    val cutDocs = cutRaw.filter(r => r.getLong(1) != r.getLong(2))
      .map(_.getLong(0)).toSet
    assert(cutDocs == dupDocs)
  }
}
