package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom-pruned join equals the plain join exactly") {
    val probe = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val build = Tables.load(spark, TestSpark.sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderstatus")
    val pruned = BloomJoin.prunedJoin(probe, build, "l_orderkey", "o_orderkey", 20000L)
      .select("l_orderkey", "o_orderstatus")
    val plain = probe.join(build, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "o_orderstatus")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("NULL probe keys drop, matching inner-join semantics") {
    val probe = Seq((Some(1L), "a"), (None, "b"), (Some(9L), "c")).toDF("pk", "pv")
    val build = Seq((1L, "x")).toDF("bk", "bv")
    val out = BloomJoin.prunedJoin(probe, build, "pk", "bk", 10L)
      .select("pv", "bv").as[(String, String)].collect().toSet
    assert(out == Set(("a", "x")))
  }

  test("the probe filter is scan-side: might_contain sits under the join, above the scan") {
    val probe = Tables.load(spark, TestSpark.sf, "lineitem").select("l_orderkey")
    val build = Tables.load(spark, TestSpark.sf, "orders")
      .filter(col("o_orderstatus") === "P").select("o_orderkey")
    val plan = BloomJoin.prunedJoin(probe, build, "l_orderkey", "o_orderkey", 5000L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter in plan:\n$plan")
    // the filter must not be ON TOP of the join
    val joinIdx = plan.indexOf("Join Inner")
    val mcIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx > joinIdx,
      s"might_contain should prune below the join:\n$plan")
  }

  test("shared column names are rejected eagerly") {
    val a = Seq((1L, "v")).toDF("k", "shared")
    val b = Seq((1L, "w")).toDF("bk", "shared")
    intercept[IllegalArgumentException](BloomJoin.prunedJoin(a, b, "k", "bk", 10L))
  }
}
