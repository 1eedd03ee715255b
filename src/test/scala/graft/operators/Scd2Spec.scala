package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val log = Seq(
    (1L, "k1", "upsert", ts("2024-01-01 00:00:00"), 10.0),
    (2L, "k1", "upsert", ts("2024-01-02 00:00:00"), 20.0),
    (3L, "k1", "delete", ts("2024-01-03 00:00:00"), 0.0),
    (4L, "k1", "upsert", ts("2024-01-04 00:00:00"), 30.0),
    (5L, "k2", "upsert", ts("2024-01-01 00:00:00"), 1.0),
    (6L, "k2", "delete", ts("2024-01-05 00:00:00"), 0.0),
    (7L, "k3", "other", ts("2024-01-01 00:00:00"), 9.0) // ignored op type
  ).toDF("seq", "k", "op", "ts", "v")

  test("upserts open versions, the next op closes them, deletes emit no row") {
    val got = Scd2.buildHistory(log, "k", "ts", "op", "upsert", "delete",
        Seq("v"), Seq(col("seq")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.get(2), r.get(3), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      ("k1", 10.0, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), false),
      ("k1", 20.0, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"), false),
      ("k1", 30.0, ts("2024-01-04 00:00:00"), null, true),
      // k2's only version was closed by a delete: NOT current despite being last
      ("k2", 1.0, ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"), false)))
  }

  test("equal timestamps break ties by the tie-break column") {
    val df = Seq(
      (1L, "k", "upsert", ts("2024-01-01 00:00:00"), 1.0),
      (2L, "k", "upsert", ts("2024-01-01 00:00:00"), 2.0)).toDF("seq", "k", "op", "ts", "v")
    val got = Scd2.buildHistory(df, "k", "ts", "op", "upsert", "delete",
        Seq("v"), Seq(col("seq")))
      .collect().map(r => (r.getDouble(1), r.getBoolean(4))).toSet
    assert(got == Set((1.0, false), (2.0, true)))
  }

  test("pointInTime honors deletes: facts after a delete see NO state") {
    val hist = Scd2.buildHistory(log, "k", "ts", "op", "upsert", "delete",
      Seq("v"), Seq(col("seq")))
    val facts = Seq(
      (100L, "k1", ts("2024-01-01 12:00:00")), // inside v=10
      (101L, "k1", ts("2024-01-03 12:00:00")), // after the delete, before v=30
      (102L, "k1", ts("2024-01-05 00:00:00")), // inside current v=30
      (103L, "k2", ts("2024-01-06 00:00:00")), // k2 deleted on the 5th
      (104L, "k2", ts("2023-12-31 00:00:00")), // before k2's first version
      (105L, "kX", ts("2024-01-01 00:00:00"))  // key with no history
    ).toDF("fact_id", "k", "ts")
    val got = Scd2.pointInTime(facts, hist, "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[Any]("pit_v")).toMap
    assert(got == Map(100L -> 10.0, 101L -> null, 102L -> 30.0,
      103L -> null, 104L -> null, 105L -> null))
  }

  test("pointInTime at the exact version boundary sees the NEW version (interval is [from, to))") {
    val hist = Scd2.buildHistory(log, "k", "ts", "op", "upsert", "delete",
      Seq("v"), Seq(col("seq")))
    val facts = Seq((1L, "k1", ts("2024-01-02 00:00:00"))).toDF("fact_id", "k", "ts")
    val got = Scd2.pointInTime(facts, hist, "k", "ts", Seq("v")).head()
    assert(got.getAs[Double]("pit_v") == 20.0)
  }

  test("pointInTime with equal-timestamp upserts sees the surviving version, never the zero-length one") {
    // two upserts at the same instant: buildHistory emits a zero-length
    // expired version (valid_from == valid_to) AND its survivor with the
    // SAME valid_from — the as-of must deterministically pick the survivor
    val dupLog = Seq(
      (1L, "k", "upsert", ts("2024-01-01 00:00:00"), 1.0),
      (2L, "k", "upsert", ts("2024-01-01 00:00:00"), 2.0)).toDF("seq", "k", "op", "ts", "v")
    val hist = Scd2.buildHistory(dupLog, "k", "ts", "op", "upsert", "delete",
      Seq("v"), Seq(col("seq")))
    val facts = Seq(
      (1L, "k", ts("2024-01-01 00:00:00")),  // at the shared instant
      (2L, "k", ts("2024-01-02 00:00:00")))  // well inside the survivor
      .toDF("fact_id", "k", "ts")
    val got = Scd2.pointInTime(facts, hist, "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[Any]("pit_v")).toMap
    assert(got == Map(1L -> 2.0, 2L -> 2.0))
  }

  test("snapshotAt returns exactly the versions containing the instant") {
    val hist = Scd2.buildHistory(log, "k", "ts", "op", "upsert", "delete",
      Seq("v"), Seq(col("seq")))
    val got = Scd2.snapshotAt(hist, lit(ts("2024-01-02 12:00:00")))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got == Set(("k1", 20.0), ("k2", 1.0)))
  }

  test("timeWeightedStats clamps intervals to the window and skips deletion gaps") {
    val hist = Scd2.buildHistory(log, "k", "ts", "op", "upsert", "delete",
      Seq("v"), Seq(col("seq")))
    // window Jan 1 12:00 .. Jan 6 00:00
    val got = Scd2.timeWeightedStats(hist, "k", "v",
        lit(ts("2024-01-01 12:00:00")), lit(ts("2024-01-06 00:00:00")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val h12 = 12L * 3600 * 1000
    val d1 = 24L * 3600 * 1000
    // k1: v=10 covers Jan1 12:00..Jan2 (12h), v=20 covers Jan2..Jan3 (24h),
    //     gap Jan3..Jan4 (deleted), v=30 covers Jan4..Jan6 (48h)
    assert(got("k1") == ((h12 + d1 + 2 * d1,
      1000L * h12 + 2000L * d1 + 3000L * 2 * d1)))
    // k2: v=1 covers Jan1 12:00..Jan5 (3.5 days), deleted after
    assert(got("k2") == ((3 * d1 + h12, 100L * (3 * d1 + h12))))
  }

  test("output-column collisions are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Scd2.buildHistory(log.withColumnRenamed("v", "valid_from"),
        "k", "ts", "op", "upsert", "delete", Seq("valid_from"))
    }
  }

  // bitemporal: assertions (key, validTs, txTs); later tx about the
  // same valid instant is a correction
  private val bilog = Seq(
    // k1: day-1 value asserted 10, corrected to 11 on day 3
    (1L, "k1", ts("2024-01-01 00:00:00"), ts("2024-01-01 09:00:00"), "upsert", 10.0),
    (2L, "k1", ts("2024-01-01 00:00:00"), ts("2024-01-03 09:00:00"), "upsert", 11.0),
    // k1: day-2 value 20, retracted (delete) on day 4
    (3L, "k1", ts("2024-01-02 00:00:00"), ts("2024-01-02 09:00:00"), "upsert", 20.0),
    (4L, "k1", ts("2024-01-02 00:00:00"), ts("2024-01-04 09:00:00"), "delete", 0.0),
    // k2: single assertion
    (5L, "k2", ts("2024-01-01 00:00:00"), ts("2024-01-01 10:00:00"), "upsert", 5.0)
  ).toDF("seq", "k", "vts", "tts", "op", "v")

  private def snap(validAt: String, txAt: String): Map[String, (Timestamp, Double)] =
    Scd2.bitemporalSnapshot(bilog, "k", "vts", "tts", "op", "upsert", "delete",
        Seq("v"), lit(validAt).cast("timestamp"), lit(txAt).cast("timestamp"),
        Seq(col("seq")))
      .collect().map(r => r.getString(0) -> ((r.getTimestamp(1), r.getDouble(3)))).toMap

  test("bitemporal: corrections supersede only after their transaction time") {
    // as known Jan 2 noon: day-2 value 20 is current, day-1 still reads 10
    assert(snap("2024-01-05 00:00:00", "2024-01-02 12:00:00") ==
      Map("k1" -> ((ts("2024-01-02 00:00:00"), 20.0)),
          "k2" -> ((ts("2024-01-01 00:00:00"), 5.0))))
    // as known Jan 5: the day-2 assertion is now a DELETE (the entity
    // ceased to exist at day 2 in valid time), so k1 has NO state at
    // validAt Jan 5 — a fallback to day-1 would resurrect valid-time
    // state the delete superseded
    assert(snap("2024-01-05 00:00:00", "2024-01-05 00:00:00") ==
      Map("k2" -> ((ts("2024-01-01 00:00:00"), 5.0))))
  }

  test("appendToHistory law: incremental absorption equals the full rebuild, any split") {
    val rng = new scala.util.Random(20260814L)
    val instants = (1 to 8).map(i => ts(f"2024-01-0$i 00:00:00"))
    for (trial <- 1 to 3) {
      val ops = (1 to 60).map { seq =>
        (seq.toLong, s"k${rng.nextInt(4)}",
          if (rng.nextInt(10) < 8) "upsert" else "delete",
          instants(rng.nextInt(instants.size)), rng.nextInt(100).toDouble)
      }.toDF("seq", "k", "op", "ts", "v")
      val full = Scd2.buildHistory(ops, "k", "ts", "op", "upsert", "delete",
        Seq("v"), Seq(col("seq"))).collect().toSet
      for (cut <- Seq(0L, 20L, 45L, 60L)) {
        val hist = Scd2.buildHistory(ops.filter(col("seq") <= cut),
          "k", "ts", "op", "upsert", "delete", Seq("v"), Seq(col("seq")))
        val got = Scd2.appendToHistory(hist, ops.filter(col("seq") > cut),
          "k", "ts", "op", "upsert", "delete", Seq("v"), Seq("seq"))
          .collect().toSet
        assert(got == full, s"trial $trial cut $cut")
      }
    }
  }

  test("appendToHistory: untouched keys pass through; empty batch is identity") {
    val hist = Scd2.buildHistory(log, "k", "ts", "op", "upsert", "delete",
      Seq("v"), Seq(col("seq")))
    val newOps = Seq((100L, "k1", "upsert", ts("2024-02-01 00:00:00"), 99.0))
      .toDF("seq", "k", "op", "ts", "v")
    val got = Scd2.appendToHistory(hist, newOps, "k", "ts", "op",
      "upsert", "delete", Seq("v"), Seq("seq"))
    // k2's versions byte-identical to the original history
    assert(got.filter(col("k") === "k2").collect().toSet ==
      hist.filter(col("k") === "k2").collect().toSet)
    // k1 absorbed the new version: previous current closes at Feb 1
    val k1 = got.filter(col("k") === "k1" && col("is_current")).collect()
    assert(k1.length == 1 && k1.head.getDouble(1) == 99.0)
    val empty = Scd2.appendToHistory(hist, newOps.filter(lit(false)),
      "k", "ts", "op", "upsert", "delete", Seq("v"), Seq("seq"))
    assert(empty.collect().toSet == hist.collect().toSet)
  }

  test("bitemporal: valid-time cutoff ignores later valid instants entirely") {
    // validAt Jan 1: day-2 assertions invisible regardless of tx knowledge
    assert(snap("2024-01-01 00:00:00", "2024-01-05 00:00:00") ==
      Map("k1" -> ((ts("2024-01-01 00:00:00"), 11.0)),
          "k2" -> ((ts("2024-01-01 00:00:00"), 5.0))))
    // txAt before anything was learned: empty
    assert(snap("2024-01-05 00:00:00", "2024-01-01 08:00:00").isEmpty)
  }
}
