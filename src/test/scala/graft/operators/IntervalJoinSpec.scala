package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
  // dedup to one interval per id (deterministic min) so pair identity
  // is well-defined; the %37 filter is a deterministic subset (limit()
  // may pick different rows per evaluation of a self-joined subtree).
  private def shipIntervals(alias: String) =
    Tables.load(spark, TestSpark.sf, "lineitem")
      .filter(col("l_orderkey") % 37 === 0)
      .select(
        col("l_suppkey").as(s"${alias}_k"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as(s"${alias}_id"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long")
          .as(s"${alias}_lo"),
        (datediff(to_date(col("l_shipdate")), lit("1970-01-01")) +
          col("l_quantity").cast("long") + 1).as(s"${alias}_hi"))
      .groupBy(s"${alias}_k", s"${alias}_id")
      .agg(min(col(s"${alias}_lo")).as(s"${alias}_lo"),
        min(col(s"${alias}_hi")).as(s"${alias}_hi"))

  test("banded overlap join equals the naive overlap-condition join, exactly once per pair") {
    val a = shipIntervals("a")
    val b = shipIntervals("b")
    val banded = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bandWidth = 32.0, keys = Seq(("a_k", "b_k")))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "overlap_lo", "overlap_hi")
    val naive = a.join(b,
        col("a_k") === col("b_k") && col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        greatest(col("a_lo"), col("b_lo")).as("overlap_lo"),
        least(col("a_hi"), col("b_hi")).as("overlap_hi"))
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
    assert(banded.count() > 0)
    // exactly once: no duplicate pairs from multi-band collisions
    assert(banded.groupBy("a_id", "b_id").count().filter(col("count") > 1).isEmpty)
  }

  test("plan is an equi-join on the band key, not a nested-loop join") {
    val a = Seq((1L, 0L, 10L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 5L, 15L)).toDF("b_id", "b_lo", "b_hi")
    val plan = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to nested loop:\n$plan")
  }

  test("half-open semantics: touching intervals do not match; NULLs never match") {
    val a = Seq((1L, Some(0L), Some(2L)), (2L, None, Some(9L))).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, Some(2L), Some(4L)), (11L, Some(1L), Some(3L))).toDF("b_id", "b_lo", "b_hi")
    val out = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 4.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 11L))) // [0,2) vs [2,4) touch only; NULL lo row drops
  }

  test("property sweep vs naive join on random intervals with keys") {
    val rng = new scala.util.Random(20260814L)
    val a = (1 to 400).map { i =>
      val lo = rng.nextInt(1000).toLong
      (i.toLong, (i % 5).toLong, lo, lo + 1 + rng.nextInt(60))
    }.toDF("a_id", "a_k", "a_lo", "a_hi")
    val b = (1 to 400).map { j =>
      val lo = rng.nextInt(1000).toLong
      (j.toLong, (j % 5).toLong, lo, lo + 1 + rng.nextInt(60))
    }.toDF("b_id", "b_k", "b_lo", "b_hi")
    val banded = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      bandWidth = 25.0, keys = Seq(("a_k", "b_k"))).select("a_id", "b_id")
    val naive = a.join(b, col("a_k") === col("b_k") &&
      col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")).select("a_id", "b_id")
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }
}
