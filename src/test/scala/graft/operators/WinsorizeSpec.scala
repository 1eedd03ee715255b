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

  test("bounds join flips broadcast -> shuffle past the group-count threshold") {
    val df = (1 to 200).map(i => (s"g$i", i.toLong)).toDF("g", "v")
    def joinNodes(out: org.apache.spark.sql.DataFrame): String =
      out.queryExecution.executedPlan.toString
    // auto-broadcast off: any BroadcastHashJoin below can only come from
    // the explicit hint, so its presence/absence proves the route
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 200 groups under a roomy threshold: bounds hinted -> broadcast
      val small = Winsorize.clipByRank(df, Seq("g"), "v", 10, "w")
      assert(joinNodes(small).contains("BroadcastHashJoin"))
      // threshold forced below the group count: no hint -> shuffled join
      val big = Winsorize.clipByRank(df, Seq("g"), "v", 10, "w", broadcastMaxGroups = 50)
      val plan = joinNodes(big)
      assert(!plan.contains("BroadcastHashJoin"), s"forced broadcast survived:\n$plan")
      // both plans produce identical rows
      assert(small.collect().map(_.toSeq).toSet == big.collect().map(_.toSeq).toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("KLL approx tier agrees with the exact tier while sketches are uncompacted") {
    // group sizes chosen so n*pct/100 is never integral: the inclusive
    // KLL quantile and the exact ceil-rank then pick the same element
    val rng = new scala.util.Random(11L)
    val rows = (for (g <- 0 until 4; _ <- 0 until 97)
      yield (s"g$g", rng.nextInt(1000).toLong)).toSeq
    val df = rows.toDF("g", "v")
    val exact = Winsorize.clipByRank(df, Seq("g"), "v", 10, "w")
      .groupBy("g").agg(sum("w").as("s"), min("w").as("mn"), max("w").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = Winsorize.clipByQuantiles(df, Seq("g"), "v", 10, "w")
      .groupBy("g").agg(sum("w").as("s"), min("w").as("mn"), max("w").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx == exact)
    // clipped output column keeps the value column's type (no double leak)
    val schema = Winsorize.clipByQuantiles(df, Seq("g"), "v", 10, "w").schema
    assert(schema("w").dataType == org.apache.spark.sql.types.LongType)
  }

  test("NULL GROUP rows clip within their own group (null-safe bounds join)") {
    // the null group holds an extreme outlier: a plain equi-join back
    // would leave it unclipped — the null-safe join must not
    val df = ((1 to 20).map(v => (Option("a"), v.toLong)) ++
      (1 to 20).map(v => (Option.empty[String], v.toLong * 100))).toDF("g", "v")
    // pct=9: n*pct/100 = 1.8 non-integral, so the KLL inclusive rank and
    // the exact ceil-rank agree (k = 2) and both tiers assert identically
    for (clipped <- Seq(
        Winsorize.clipByRank(df, Seq("g"), "v", 9, "w"),
        Winsorize.clipByQuantiles(df, Seq("g"), "v", 9, "w"))) {
      val byRow = clipped.collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getLong(2)).toMap
      // group a: n=20, k=2 -> [2, 19]
      assert(byRow((Some("a"), 1L)) == 2L && byRow((Some("a"), 20L)) == 19L)
      // null group: values 100..2000, k=2 -> [200, 1900] — CLIPPED
      assert(byRow((None, 100L)) == 200L, "null group's low outlier unclipped")
      assert(byRow((None, 2000L)) == 1900L, "null group's high outlier unclipped")
      assert(byRow((None, 1000L)) == 1000L)
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
