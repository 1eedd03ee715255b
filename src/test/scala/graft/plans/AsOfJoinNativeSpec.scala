package graft.plans

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.AsOfJoin

class AsOfJoinNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest right row at-or-before each left timestamp; <= ties visible") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),
      (2L, "k1", ts("2024-01-01 12:00:00")),
      (3L, "k2", ts("2024-01-01 09:00:00")),
      (4L, "k3", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", ts("2024-01-01 09:30:00"), 10.0),
      ("k1", ts("2024-01-01 11:00:00"), 20.0),
      ("k2", ts("2024-01-01 09:30:00"), 30.0),
      ("k3", ts("2024-01-01 10:00:00"), 40.0)).toDF("k", "ts", "v")
    val got = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", Seq("v"))
      .select("id", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(10.0))
    assert(got(2L).contains(20.0))
    assert(got(3L).isEmpty)        // right row is after the left row
    assert(got(4L).contains(40.0)) // equal timestamp: visible
  }

  test("empty right side: all-null payload, left rows preserved") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq.empty[(String, Timestamp, Double)].toDF("k", "ts", "v")
    val rows = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", Seq("v")).collect()
    assert(rows.length == 1 && rows(0).isNullAt(rows(0).fieldIndex("asof_v")))
  }

  test("NULL payload in the latest right row wins over older values") {
    val left = Seq((1L, "k", ts("2024-01-01 12:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("k", ts("2024-01-01 10:00:00"), Option(5.0)),
      ("k", ts("2024-01-01 11:00:00"), Option.empty[Double])).toDF("k", "ts", "v")
    val got = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", Seq("v"))
      .select("asof_v").head()
    assert(got.isNullAt(0))
  }

  test("matches the union+window form row-for-row on the events fixture") {
    val ev = graft.Tables.load(spark, TestSpark.sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("pv"))
    val window = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts", Seq("pv"))
      .select("event_id", "asof_pv")
    val native = AsOfJoin.asOfNative(clicks, purchases, Seq("user_id"), "ts", Seq("pv"))
      .select("event_id", "asof_pv")
    assert(native.count() == clicks.count())
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("plan shape: as-of exec node, no window, no union, no join") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("k", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val df = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected an as-of exec in:\n$plan")
    val lower = plan.toLowerCase
    assert(!lower.contains("window") && !lower.contains("union"))
    assert(!lower.contains("sortmergejoin") && !lower.contains("hashjoin"))
  }

  test("strategy picks broadcast for a small right side: left keeps its layout") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("k", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val plan = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"expected broadcast form in:\n$plan")
    // the ONLY exchange is the right-side broadcast — the left side is
    // neither shuffled nor sorted
    assert(!plan.contains("Exchange hashpartitioning"), s"left side was shuffled:\n$plan")
    assert(plan.contains("BroadcastExchange"))
  }

  test("threshold off forces the co-partitioned merge form; both agree") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = graft.Tables.load(spark, TestSpark.sf, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("pv"))
      val merged = AsOfJoin.asOfNative(clicks, purchases, Seq("user_id"), "ts", Seq("pv"))
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin") && !plan.contains("BroadcastAsOfJoin"),
        s"expected the shuffled merge form in:\n$plan")
      val window = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts", Seq("pv"))
        .select("event_id", "asof_pv")
      val native = merged.select("event_id", "asof_pv")
      assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("multiple keys and interleaved partitions stay aligned") {
    // enough distinct keys to span all 4 shuffle partitions
    val left = (1 to 200).map(i =>
      (i.toLong, s"k${i % 17}", ts(f"2024-01-01 ${10 + i % 12}%02d:00:00")))
      .toDF("id", "k", "ts")
    val right = (1 to 60).map(i =>
      (s"k${i % 17}", ts(f"2024-01-01 ${9 + i % 13}%02d:30:00"), i.toDouble))
      .toDF("k", "ts", "v")
    val native = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", Seq("v"))
      .select("id", "asof_v")
    val window = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
      .select("id", "asof_v")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }
}
