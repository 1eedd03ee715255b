package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.Dedup

class MinHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fused kernel is bit-identical to the HOF reference form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
      (3L, "a"),
      (4L, "")).toDF("id", "text")
    val both = docs.select(col("id"),
      Dedup.minHashSignature(Dedup.shingles("text", 1)).as("native"),
      Dedup.minHashSignatureHof(Dedup.shingles("text", 1)).as("hof"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"signature mismatch for id ${r.getLong(0)}")
    }
    // empty text → empty shingles → H nulls, matching array_min(empty)
    val empty = rows.find(_.getLong(0) == 4L).get.getSeq[Any](1)
    assert(empty.length == 64 && empty.forall(_ == null))
  }

  test("null input propagates; signature length tracks numHashes") {
    val df = Seq((1L, Option("x y z")), (2L, Option.empty[String])).toDF("id", "text")
    val got = df.select(col("id"),
      Dedup.minHashSignature(Dedup.shingles("text", 1), numHashes = 16).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).get.asInstanceOf[scala.collection.Seq[_]].length == 16)
    assert(got(2L).isEmpty)
  }

  test("interpreted eval matches codegen (direct expression eval)") {
    // force interpreted path by eval'ing the expression directly
    val as = Array(3L, 5L); val bs = Array(7L, 11L); val p = 2147483647L
    val ex = MinHashMins(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(100L, 200L, 3L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      as, bs, p)
    val out = ex.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.toLongArray().toSeq ==
      Seq(Seq(307L, 607L, 16L).min, Seq(507L, 1011L, 26L).min))
  }
}
