package graft.validation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HashRefinementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("refinement attributes exactly the differing columns") {
    val src = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "name", "price")
    val tgt = Seq(
      (1L, "a", 10.0),            // clean
      (2L, "B", 20.0),            // name differs
      (3L, "c", 33.0),            // price differs
      (4L, "D", 44.0))            // both differ
      .toDF("id", "name", "price")
    val got = HashRefinement.refine(src, tgt, Seq("id"), Seq("name", "price"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "name", 3L -> "price", 4L -> "name,price"))
  }

  test("null vs value and null vs null compare correctly through digests") {
    val src = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("id", "v")
    val tgt = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("y")))
      .toDF("id", "v")
    val got = HashRefinement.refine(src, tgt, Seq("id"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "v", 3L -> "v")) // 2: null==null
  }

  test("sampleFailures bounds the driver-side drain") {
    val failures = spark.range(100000).toDF("id")
    val got = Diff.sampleFailures(failures, 7)
    assert(got.size == 7)
  }
}
