package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class WinsorizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clips to the exact k-th order statistics per group") {
    // group a: 1..20, pct 10 -> k=2: bounds [2, 19]
    val df = ((1 to 20).map(v => ("a", v.toLong)) ++ Seq(("b", 100L))).toDF("g", "v")
    val byIn = Winsorize.clipByRank(df, Seq("g"), "v", 10, "w")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byIn(("a", 1L)) == 2L && byIn(("a", 2L)) == 2L)
    assert(byIn(("a", 20L)) == 19L && byIn(("a", 19L)) == 19L)
    assert(byIn(("a", 10L)) == 10L)
    assert(byIn(("b", 100L)) == 100L) // single-member group: clipped to itself
  }

  test("matches a brute-force order-statistic clip on random data with ties") {
    val rng = new scala.util.Random(5L)
    val rows = (1 to 500).map(i => (s"g${i % 3}", rng.nextInt(40).toLong))
    val got = Winsorize.clipByRank(rows.toDF("g", "v"), Seq("g"), "v", 5, "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGroup = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.size
      val k = math.max(1, math.ceil(n * 5 / 100.0).toLong).toInt
      g -> ((sorted(k - 1), sorted(n - k)))
    }
    got.foreach { case (g, v, w) =>
      val (lo, hi) = byGroup(g)
      assert(w == math.min(math.max(v, lo), hi), s"($g, $v)")
    }
  }

  test("NULL values pass through unclipped; reserved/validation errors are eager") {
    val df = Seq(("a", Some(1L)), ("a", Some(100L)), ("a", None)).toDF("g", "v")
    val got = Winsorize.clipByRank(df, Seq("g"), "v", 10, "w")
      .collect().map(r => Option(r.get(1)) -> Option(r.get(2))).toMap
    assert(got(None).isEmpty)
    intercept[IllegalArgumentException](
      Winsorize.clipByRank(df, Seq("g"), "v", 50, "w"))
    intercept[IllegalArgumentException](
      Winsorize.clipByRank(df, Seq("g"), "v", 10, "v"))
  }
}
