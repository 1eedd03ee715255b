package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Edge geometry for the banded interval join: negative coordinates
  * (floor-division band assignment must stay consistent across zero)
  * and degenerate empty intervals.
  */
class IntervalJoinEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("negative and zero-straddling coordinates: banded equals naive") {
    val rng = new scala.util.Random(20260814L)
    val a = (1 to 200).map { i =>
      val lo = rng.nextInt(400).toLong - 200
      (i.toLong, lo, lo + 1 + rng.nextInt(40))
    }.toDF("a_id", "a_lo", "a_hi")
    val b = (1 to 200).map { j =>
      val lo = rng.nextInt(400).toLong - 200
      (j.toLong, lo, lo + 1 + rng.nextInt(40))
    }.toDF("b_id", "b_lo", "b_hi")
    val banded = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 16.0)
      .select("a_id", "b_id")
    val naive = a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("a_id", "b_id")
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
    assert(banded.count() > 0)
    // still exactly once per pair
    assert(banded.groupBy("a_id", "b_id").count().filter(col("count") > 1).isEmpty)
  }

  test("empty intervals (lo == hi) never match anything, even themselves") {
    val a = Seq((1L, 5L, 5L), (2L, 0L, 10L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 5L, 5L), (11L, 4L, 6L)).toDF("b_id", "b_lo", "b_hi")
    val out = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 4.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // a=1 is empty: matches nothing; b=10 empty: matches nothing
    assert(out == Set((2L, 11L)))
  }
}
