package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("each left row sees the latest right row at or before its timestamp") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),
      (2L, "k1", ts("2024-01-01 12:00:00")),
      (3L, "k2", ts("2024-01-01 09:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", ts("2024-01-01 09:30:00"), 10.0),
      ("k1", ts("2024-01-01 11:00:00"), 20.0),
      ("k2", ts("2024-01-01 09:30:00"), 30.0)).toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
      .select("id", "asof_v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(10.0)) // 09:30 value at 10:00
    assert(got(2L).contains(20.0)) // superseded at 11:00
    assert(got(3L).isEmpty)        // k2 right row is after the left row
  }

  test("equal timestamps: the right row is visible (<= semantics)") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("k", ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v")).select("asof_v").head()
    assert(got.getDouble(0) == 7.0)
  }

  test("a right row with a NULL payload still supersedes older rows") {
    val left = Seq((1L, "k", ts("2024-01-01 12:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("k", ts("2024-01-01 10:00:00"), Option(5.0)),
      ("k", ts("2024-01-01 11:00:00"), Option.empty[Double])).toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v")).select("asof_v").head()
    // the most recent right row (11:00) carries NULL — that NULL must
    // win, not the stale 5.0 from 10:00
    assert(got.isNullAt(0))
  }

  test("NULL join keys never match (SQL equality semantics, both forms)") {
    val left = Seq(
      (1L, Option("k"), ts("2024-01-01 12:00:00")),
      (2L, Option.empty[String], ts("2024-01-01 12:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (Option("k"), ts("2024-01-01 10:00:00"), 5.0),
      (Option.empty[String], ts("2024-01-01 11:00:00"), 99.0)).toDF("k", "ts", "v")
    for (form <- Seq(AsOfJoin.asOf _, AsOfJoin.asOfNative _)) {
      val got = form(left, right, Seq("k"), "ts", Seq("v"))
        .select("id", "asof_v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got(1L).contains(5.0))
      // the NULL-key left row must NOT pick up the NULL-key right payload
      assert(got(2L).isEmpty, s"NULL-key left row matched in $form")
    }
  }

  test("reserved internal / output column names are rejected") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("k", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left.withColumn("__side", lit(1)), right, Seq("k"), "ts", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right.withColumn("__r", lit(1)), Seq("k"), "ts", Seq("v"))
    }
    intercept[IllegalArgumentException] { // left column shadowing the output name
      AsOfJoin.asOf(left.withColumn("asof_v", lit(0.0)), right, Seq("k"), "ts", Seq("v"))
    }
    intercept[IllegalArgumentException] { // native form: rename-prefix clash
      AsOfJoin.asOfNative(left.withColumn("__r_k", lit(1)), right, Seq("k"), "ts", Seq("v"))
    }
  }

  test("plan shape: one shuffle on the key, no join node") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("k", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), "as-of must not plan a join")
    assert(plan.count(_.toString.contains("Exchange")) >= 0) // window exchange only
  }
}
