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

  test("auto width tracks the MEDIAN span on skewed fixtures, not the mean") {
    val rng = new scala.util.Random(31L)
    // 400 short intervals (span ~8..12) + 8 long outliers (span ~1000):
    // the mean span is ~30, the median ~10 — a mean-based width would
    // overshoot 3x and fatten every band's compare set
    def side(p: String) = ((1 to 400).map { i =>
      val lo = rng.nextInt(5000).toLong
      (i.toLong, lo, lo + 8 + rng.nextInt(5))
    } ++ (1 to 8).map { i =>
      val lo = rng.nextInt(4000).toLong
      ((400 + i).toLong, lo, lo + 950 + rng.nextInt(100))
    }).toDF(s"${p}_id", s"${p}_lo", s"${p}_hi")
    val a = side("a")
    val b = side("b")
    val (w, maxSpan) = IntervalJoin.pickBandWidth(a, b, "a_lo", "a_hi", "b_lo", "b_hi")
    assert(w >= 8 * 1.25 && w <= 12 * 1.25, s"picked $w, expected ~median*1.25")
    assert(maxSpan >= 950 && maxSpan <= 1050)
    // and the auto join equals a fixed-width call pair-for-pair
    val auto = IntervalJoin.overlapJoinAuto(a, b, "a_lo", "a_hi", "b_lo", "b_hi")
      .select("a_id", "b_id")
    val fixed = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 25.0)
      .select("a_id", "b_id")
    assert(auto.exceptAll(fixed).isEmpty && fixed.exceptAll(auto).isEmpty)
  }

  test("auto join aborts before shuffling when an open-ended interval would explode") {
    // one effectively-open-ended row: span 10^9 against a ~10-wide median
    val a = ((1L, 0L, 10L) :: (2L, 5L, 1000000000L) :: Nil).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((1L, 3L, 12L)).toDF("b_id", "b_lo", "b_hi")
    val e = intercept[IllegalArgumentException](
      IntervalJoin.overlapJoinAuto(a, b, "a_lo", "a_hi", "b_lo", "b_hi"))
    assert(e.getMessage.contains("clamp open-ended intervals"))
    // clamping to the horizon makes the same call fine
    val clamped = a.withColumn("a_hi", least(col("a_hi"), lit(100L)))
    val got = IntervalJoin.overlapJoinAuto(clamped, b, "a_lo", "a_hi", "b_lo", "b_hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L)))
  }
}
