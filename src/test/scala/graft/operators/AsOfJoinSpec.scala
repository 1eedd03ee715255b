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

  test("asOfNearest picks the closer side, ties backward, tolerance nulls out") {
    import spark.implicits._
    val left = Seq(
      (1L, "k", 100L),  // backward at 90 (d=10) vs forward at 130 (d=30) -> b
      (2L, "k", 128L),  // backward 90 (d=38) vs forward 130 (d=2) -> f
      (3L, "k", 500L),  // nothing within tolerance 50 -> null
      (4L, "k", 110L),  // equidistant: 90 (d=20) vs 130 (d=20) -> backward wins
      (5L, "x", 100L)   // key with no right rows -> null
    ).toDF("id", "k", "ts")
    val right = Seq(("k", 90L, "A"), ("k", 130L, "B"), ("k", 700L, "C"))
      .toDF("k", "ts", "v")
    val got = graft.operators.AsOfJoin.asOfNearest(left, right, Seq("k"), "ts",
        Seq("v"), tolerance = 50L, leftId = "id")
      .select("id", "near_v", "near_dist", "near_dir")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) == ((Some("A"), Some(10L), Some("b"))))
    assert(got(2L) == ((Some("B"), Some(2L), Some("f"))))
    assert(got(3L) == ((None, None, None)))
    assert(got(4L) == ((Some("A"), Some(20L), Some("b"))))
    assert(got(5L) == ((None, None, None)))
  }

  test("asOfNearest matches brute force on random timelines") {
    import spark.implicits._
    val rng = new scala.util.Random(17L)
    val left = (1 to 300).map(i => (i.toLong, s"k${i % 4}", rng.nextInt(1000).toLong))
    val right = (1 to 120).map(j => (s"k${j % 4}", rng.nextInt(1000).toLong, j.toLong))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique per (k, ts)
    val tol = 40L
    val got = graft.operators.AsOfJoin.asOfNearest(
        left.toDF("id", "k", "ts"), right.toDF("k", "ts", "v"),
        Seq("k"), "ts", Seq("v"), tol, "id")
      .select("id", "near_v", "near_dist")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    left.foreach { case (id, k, ts) =>
      val cands = right.filter(_._1 == k).map(t => (math.abs(t._2 - ts), t._2 <= ts, t._3))
        .filter(_._1 <= tol)
      val expect =
        if (cands.isEmpty) None
        else Some(cands.minBy(c => (c._1, !c._2))._3) // nearest, tie -> backward
      assert(got(id) == expect, s"id=$id")
    }
  }
}
