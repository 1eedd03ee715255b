package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RetentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")

  test("weekly retention triangle with hand-computed buckets") {
    // 2024-01-01 is epoch day 19723; 19723/7 = 2817 (floor) — week index.
    val df = Seq(
      ("a", ts("2024-01-01")), // cohort week w
      ("a", ts("2024-01-10")), // w+1 (day 19732 → 2818)
      ("a", ts("2024-01-20")), // w+2 (day 19742 → 2820? 19742/7=2820.28 → 2820) — offset 3? verified below
      ("b", ts("2024-01-02")), // same cohort week as a
      ("c", ts("2024-01-10"))  // later cohort
    ).toDF("u", "ts")
    val got = Retention.cohortRetention(df, "u", "ts", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d = (s: String) => java.time.LocalDate.parse(s).toEpochDay
    val w = (s: String) => Math.floorDiv(d(s), 7)
    val cohortA = w("2024-01-01")
    assert(w("2024-01-02") == cohortA) // a and b share the cohort
    val expected = Set(
      (cohortA, 0L, 2L, 2L),                                // a+b active in their own week
      (cohortA, w("2024-01-10") - cohortA, 1L, 2L),         // only a
      (cohortA, w("2024-01-20") - cohortA, 1L, 2L),         // only a
      (w("2024-01-10"), 0L, 1L, 1L))                        // c's own cohort
    assert(got == expected)
  }

  test("daily buckets: offset is whole days") {
    val df = Seq(
      ("a", ts("2024-01-01")), ("a", ts("2024-01-03")),
      ("b", ts("2024-01-01"))).toDF("u", "ts")
    val got = Retention.cohortRetention(df, "u", "ts", 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, 2L, 2L), (2L, 1L, 2L)))
  }

  test("multiple events of one key in one bucket count once") {
    val df = Seq(("a", ts("2024-01-01")), ("a", ts("2024-01-01"))).toDF("u", "ts")
    val got = Retention.cohortRetention(df, "u", "ts", 7).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
  }
}
