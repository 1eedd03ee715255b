package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("banded range join equals the naive range-condition join") {
    val points = Tables.load(spark, TestSpark.sf, "events").select("event_id", "value")
    val intervals = Tables.load(spark, TestSpark.sf, "nation").select(col("n_name"),
      (col("n_nationkey") * 20.0).as("lo"), (col("n_nationkey") * 20.0 + 25.0).as("hi"))
    val banded = RangeJoin.pointsInIntervals(points, intervals, "value", "lo", "hi", 25.0)
      .select("event_id", "n_name")
    val naive = points.join(intervals, col("value") >= col("lo") && col("value") < col("hi"))
      .select("event_id", "n_name")
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
    assert(banded.count() > 0)
  }

  test("plan is an equi-join on the band key, not a nested-loop join") {
    val points = Seq((1L, 3.0)).toDF("id", "value")
    val intervals = Seq(("a", 0.0, 10.0)).toDF("name", "lo", "hi")
    val plan = RangeJoin.pointsInIntervals(points, intervals, "value", "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to nested loop:\n$plan")
  }

  test("property sweep: equals the naive join on random data, NULLs never match") {
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val points = (1 to 300).map { i =>
        (i.toLong, if (rng.nextInt(10) == 0) None else Some(rng.nextDouble() * 100 - 20))
      }.toDF("id", "value")
      val intervals = (1 to 60).map { j =>
        val lo = rng.nextDouble() * 100 - 20
        (s"i$j",
          if (rng.nextInt(10) == 0) None else Some(lo),
          if (rng.nextInt(10) == 0) None else Some(lo + rng.nextDouble() * 15))
      }.toDF("name", "lo", "hi")
      for (w <- Seq(1.0, 7.5, 40.0)) {
        val banded = RangeJoin
          .pointsInIntervals(points, intervals, "value", "lo", "hi", w)
          .select("id", "name")
        val naive = points
          .join(intervals, col("value") >= col("lo") && col("value") < col("hi"))
          .select("id", "name")
        assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty,
          s"trial=$trial bandWidth=$w")
      }
    }
    // a NULL point, lo, or hi makes the range predicate UNKNOWN — no match
    val p = Seq((1L, Option.empty[Double]), (2L, Some(5.0))).toDF("id", "value")
    val i = Seq(("a", Some(0.0), Some(10.0)), ("b", Option.empty[Double], Some(10.0)),
      ("c", Some(0.0), Option.empty[Double])).toDF("name", "lo", "hi")
    val got = RangeJoin.pointsInIntervals(p, i, "value", "lo", "hi", 5.0)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "a")))
  }

  test("reserved __band and overlapping columns are rejected") {
    val points = Seq((1L, 3.0)).toDF("id", "value")
    val intervals = Seq(("a", 0.0, 10.0)).toDF("name", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointsInIntervals(points.withColumn("__band", lit(1)),
        intervals, "value", "lo", "hi", 5.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointsInIntervals(points, intervals.withColumn("__band", lit(1)),
        "value", "lo", "hi", 5.0)
    }
    intercept[IllegalArgumentException] { // shared column name → ambiguous output
      RangeJoin.pointsInIntervals(points.withColumn("name", lit("x")),
        intervals, "value", "lo", "hi", 5.0)
    }
  }

  test("band-boundary points and zero-width intervals behave exactly") {
    val points = Seq((1L, 5.0), (2L, 4.999), (3L, 10.0)).toDF("id", "value")
    val intervals = Seq(("in", 5.0, 10.0), ("empty", 7.0, 7.0)).toDF("name", "lo", "hi")
    val got = RangeJoin.pointsInIntervals(points, intervals, "value", "lo", "hi", 3.0)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "in"))) // lo inclusive, hi exclusive, empty interval matches nothing
  }
}
