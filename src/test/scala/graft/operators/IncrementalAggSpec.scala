package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import IncrementalAgg._

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("l_returnflag", "l_linestatus")
  private val metrics = Seq(
    CountRows("n"), SumOf("l_quantity", "sum_qty"),
    MinOf("l_extendedprice", "min_price"), MaxOf("l_extendedprice", "max_price"))

  test("merge law: absorb over a store equals the full aggregate, split anywhere") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_orderkey")
    for (cut <- Seq(0L, 500L, 7000L)) {
      val a = li.filter(col("l_orderkey") <= cut)
      val b = li.filter(col("l_orderkey") > cut)
      val incremental = absorb(IncrementalAgg.aggregate(a, keys, metrics), b, keys, metrics)
      val full = IncrementalAgg.aggregate(li, keys, metrics)
      assert(incremental.exceptAll(full).isEmpty && full.exceptAll(incremental).isEmpty,
        s"cut=$cut")
    }
  }

  test("keys on one side only pass through unchanged") {
    val a = Seq(("x", 1L), ("x", 3L)).toDF("k", "v")
    val b = Seq(("y", 10L)).toDF("k", "v")
    val m = Seq(CountRows("n"), SumOf("v", "s"), MinOf("v", "mn"), MaxOf("v", "mx"))
    val got = absorb(IncrementalAgg.aggregate(a, Seq("k"), m), b, Seq("k"), m)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("x", 2L, 4L, 1L, 3L), ("y", 1L, 10L, 10L, 10L)))
  }

  test("repeated absorption over many batches equals one big aggregate") {
    val batches = (0 until 5).map(i =>
      (1 to 20).map(j => (s"k${j % 3}", (i * 100 + j).toLong)).toDF("k", "v"))
    val m = Seq(CountRows("n"), SumOf("v", "s"), MaxOf("v", "mx"))
    val store = batches.tail.foldLeft(IncrementalAgg.aggregate(batches.head, Seq("k"), m))(
      (st, b) => absorb(st, b, Seq("k"), m))
    val full = IncrementalAgg.aggregate(batches.reduce(_.unionAll(_)), Seq("k"), m)
    assert(store.exceptAll(full).isEmpty && full.exceptAll(store).isEmpty)
  }

  test("layout mismatch and name collisions are rejected eagerly") {
    val a = Seq(("x", 1L)).toDF("k", "v")
    val m = Seq(SumOf("v", "s"))
    intercept[IllegalArgumentException](
      mergeDelta(IncrementalAgg.aggregate(a, Seq("k"), m), a, Seq("k"), m)) // raw frame, wrong layout
    intercept[IllegalArgumentException](
      IncrementalAgg.aggregate(a, Seq("k"), Seq(SumOf("v", "k")))) // metric name collides with key
  }
}
