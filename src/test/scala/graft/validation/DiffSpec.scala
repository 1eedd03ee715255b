package graft.validation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rows matching on a NULL key component classify as match, not missing+extra") {
    val src = Seq((Option(1L), "a"), (Option.empty[Long], "b")).toDF("pk", "v")
    val tgt = Seq((Option(1L), "a"), (Option.empty[Long], "b")).toDF("pk", "v")
    val kinds = Diff.fullDiff(src, tgt, Seq("pk"), Seq("v"))
      .collect().map(_.getString(1))
    assert(kinds.forall(_ == "match"), kinds.mkString(","))
  }

  test("null-key rows present on one side only still classify as missing/extra") {
    val src = Seq((Option.empty[Long], "b")).toDF("pk", "v")
    val tgt = spark.emptyDataset[(Option[Long], String)].toDF("pk", "v")
    val kinds = Diff.fullDiff(src, tgt, Seq("pk"), Seq("v"))
      .collect().map(_.getString(1))
    assert(kinds.toSeq == Seq("missing_target"))
  }

  test("mismatch on a null-keyed row is attributed by HashRefinement") {
    val src = Seq((Option(1L), "x", "same"), (Option.empty[Long], "y", "same"))
      .toDF("pk", "payload", "other")
    val tgt = Seq((Option(1L), "x", "same"), (Option.empty[Long], "CHANGED", "same"))
      .toDF("pk", "payload", "other")
    val got = HashRefinement.refine(src, tgt, Seq("pk"), Seq("payload", "other"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1))
    assert(got.toSeq == Seq(None -> "payload")) // null-keyed mismatch is found and attributed
  }

  test("categorizedDiff attributes each failure category in one pass") {
    // src value column is double; tgt's is string → schema-level numeric
    // type mismatch (the columnar form of NumericTypeMismatch)
    val src = Seq(
      (1L, "a", 10L, 100L, 1.5),   // full match
      (2L, "CHANGED", 10L, 100L, 1.5), // plain field diff
      (3L, "a", 99L, 100L, 1.5),   // ttl sidecar diff
      (4L, "a", 10L, 999L, 1.5),   // writetime sidecar diff
      (5L, "a", 10L, 100L, 7.5),   // type-mismatch column value diff
      (6L, "a", 10L, 100L, 1.5))   // missing in target
      .toDF("pk", "v", "v_ttl", "v_writetime", "num")
    val tgt = Seq(
      (1L, "a", 10L, 100L, "1.5"),
      (2L, "a", 10L, 100L, "1.5"),
      (3L, "a", 10L, 100L, "1.5"),
      (4L, "a", 10L, 100L, "1.5"),
      (5L, "a", 10L, 100L, "1.5"),
      (7L, "a", 10L, 100L, "1.5")) // extra in target
      .toDF("pk", "v", "v_ttl", "v_writetime", "num")
    val diff = Diff.categorizedDiff(src, tgt, Seq("pk"),
      Seq("v", "v_ttl", "v_writetime", "num"))
    val byPk = diff.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(byPk(1L) == ("match", false, false, false, false))
    assert(byPk(2L) == ("mismatch", true, false, false, false))
    assert(byPk(3L) == ("mismatch", false, true, false, false))
    assert(byPk(4L) == ("mismatch", false, false, true, false))
    assert(byPk(5L) == ("mismatch", false, false, false, true))
    assert(byPk(6L)._1 == "missing_target")
    assert(byPk(7L)._1 == "extra_target")
    val breakdown = Diff.categoryBreakdown(diff)
    assert(breakdown == Map(
      "missing_target" -> 1L, "extra_target" -> 1L,
      "differing_field_values" -> 1L, "differing_ttls" -> 1L,
      "differing_writetimes" -> 1L, "numeric_type_mismatch" -> 1L,
      "match" -> 1L))
    // same numeric value through the type-mismatch cast is NOT a failure
    // (5's tgt "1.5" == every other row's src 1.5)
    assert(!byPk(1L)._5)
  }

  test("row compare attributes ttl / writetime / numeric-type items per field") {
    import graft.validation.{RowComparisonFailure => RCF}
    val names = Seq("v", "v_ttl", "v_writetime", "num")
    val s = Seq[Any]("a", 10L, 100L, 1.5)
    val t = Seq[Any]("b", 99L, 999L, "not-a-number")
    val items = RCF.compare(names, Some(s), Some(t)).get.items
    assert(items.contains(RCF.DifferingFieldValues(Seq("v"))))
    assert(items.contains(RCF.DifferingTtls(Seq("v_ttl"))))
    assert(items.contains(RCF.DifferingWritetimes(Seq("v_writetime"))))
    assert(items.contains(RCF.NumericTypeMismatch(Seq("num"))))
    // a numeric-vs-non-numeric ttl cell is the sharper diagnosis
    val tm = RCF.compare(Seq("x_ttl"), Some(Seq[Any](10L)), Some(Seq[Any]("ten"))).get.items
    assert(tm == Seq(RCF.NumericTypeMismatch(Seq("x_ttl"))))
  }

  test("breakdown rendering and exit code follow the reference contract") {
    val clean = Map("missing_target" -> 0L, "extra_target" -> 0L,
      "differing_field_values" -> 0L, "differing_ttls" -> 0L,
      "differing_writetimes" -> 0L, "numeric_type_mismatch" -> 0L, "match" -> 42L)
    assert(graft.Validate.exitCodeFor(clean) == 0)
    assert(graft.Validate.renderBreakdown(clean) == "match=42")
    val broken = clean + ("differing_ttls" -> 3L) + ("missing_target" -> 2L)
    assert(graft.Validate.exitCodeFor(broken) == 1)
    assert(graft.Validate.renderBreakdown(broken) ==
      "missing_target=2, differing_ttls=3, match=42")
  }

  test("timestamp tolerance applies in row compare when configured") {
    import graft.validation.{RowComparisonFailure => RCF}
    val a = Seq[Any](new java.sql.Timestamp(1000L))
    val b = Seq[Any](new java.sql.Timestamp(1004L))
    // no tolerance: exact compare differs
    assert(RCF.compare(Seq("ts"), Some(a), Some(b)).isDefined)
    // 5 ms tolerance: equal
    assert(RCF.compare(Seq("ts"), Some(a), Some(b), timestampToleranceMs = 5L).isEmpty)
    // cross-type within tolerance: Timestamp vs Instant of the same epoch
    val c = Seq[Any](java.time.Instant.ofEpochMilli(1001L))
    assert(RCF.compare(Seq("ts"), Some(a), Some(c), timestampToleranceMs = 5L).isEmpty)
  }

  test("sampledDiff equals fullDiff restricted to the sampled keys") {
    val orders = graft.Tables.load(spark, TestSpark.sf, "orders")
    val src = orders.select(col("o_orderkey"), col("o_totalprice"))
    val tgt = orders.filter(col("o_orderstatus") =!= "P")
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    val sampled = Diff.sampledDiff(src, tgt, Seq("o_orderkey"), Seq("o_totalprice"), 1, 5)
    val full = Diff.fullDiff(src, tgt, Seq("o_orderkey"), Seq("o_totalprice"))
      .filter(graft.operators.Sampling.bucketOf(col("o_orderkey"), 5) < 1)
    assert(sampled.count() > 0)
    assert(sampled.exceptAll(full).isEmpty && full.exceptAll(sampled).isEmpty)
    // no fabricated missing/extra: every sampled non-match is also a
    // full-diff non-match on the same key
    val sampledBad = sampled.filter(col("diff_kind") =!= "match")
    val fullBadKeys = Diff.fullDiff(src, tgt, Seq("o_orderkey"), Seq("o_totalprice"))
      .filter(col("diff_kind") =!= "match").select("o_orderkey")
    assert(sampledBad.join(fullBadKeys, Seq("o_orderkey"), "left_anti").count() == 0)
    // rough rate sanity: 1/5 of keys within a generous band
    val frac = sampled.count().toDouble / full.unionByName(
      Diff.fullDiff(src, tgt, Seq("o_orderkey"), Seq("o_totalprice"))).count()
    assert(frac > 0.1 && frac < 0.35, s"sample fraction $frac")
  }

  test("sampledDiff composite keys: NULL components sample consistently on both sides") {
    val rows = Seq((Option(1L), Option("x"), "v1"), (Option(2L), Option.empty[String], "v2"),
      (Option.empty[Long], Option("y"), "v3"))
    val src = rows.toDF("a", "b", "v")
    val tgt = rows.toDF("a", "b", "v")
    // identical sides: every sampled row must classify as match — a
    // side-inconsistent sample key would fabricate missing+extra pairs
    (0 until 4).foreach { num =>
      val kinds = Diff.sampledDiff(src, tgt, Seq("a", "b"), Seq("v"), num + 1, 4)
        .collect().map(_.getString(2))
      assert(kinds.forall(_ == "match"), s"rate ${num + 1}/4: ${kinds.mkString(",")}")
    }
    // full rate covers everything
    assert(Diff.sampledDiff(src, tgt, Seq("a", "b"), Seq("v"), 4, 4).count() == 3)
  }
}
