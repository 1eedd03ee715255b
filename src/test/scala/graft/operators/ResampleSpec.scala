package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  // bucket_ts is TIMESTAMP_NTZ (UTC wall clock) and collects as LocalDateTime
  private def ldt(s: String) = Timestamp.valueOf(s).toLocalDateTime

  test("grid spans first..last bucket; gaps carry the last observation forward") {
    val df = Seq(
      (1L, "k", ts("2024-01-01 00:10:00"), 1.0),
      (2L, "k", ts("2024-01-01 03:50:00"), 4.0)).toDF("id", "k", "ts", "v")
    // hourly buckets: observations in buckets 0 and 3 → grid 0,1,2,3
    val got = Resample.resampleLocf(df, "k", "ts", "v", 3600, Seq(col("id")))
      .orderBy("bucket_ts")
      .collect().map(r => (r.getAs[java.time.LocalDateTime](1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (ldt("2024-01-01 00:00:00"), 1.0),
      (ldt("2024-01-01 01:00:00"), 1.0),
      (ldt("2024-01-01 02:00:00"), 1.0),
      (ldt("2024-01-01 03:00:00"), 4.0)))
  }

  test("the LAST observation in a bucket wins, ties by the tie-break column") {
    val df = Seq(
      (1L, "k", ts("2024-01-01 00:10:00"), 1.0),
      (2L, "k", ts("2024-01-01 00:40:00"), 2.0),
      (3L, "k", ts("2024-01-01 00:40:00"), 3.0)).toDF("id", "k", "ts", "v")
    val got = Resample.resampleLocf(df, "k", "ts", "v", 3600, Seq(col("id")))
      .collect()
    assert(got.length == 1 && got.head.getDouble(2) == 3.0)
  }

  test("keys resample independently") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1.0),
      (2L, "a", ts("2024-01-01 02:00:00"), 2.0),
      (3L, "b", ts("2024-01-01 05:00:00"), 9.0)).toDF("id", "k", "ts", "v")
    val got = Resample.resampleLocf(df, "k", "ts", "v", 3600, Seq(col("id")))
      .collect().map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1), r.getDouble(2))).toSet
    assert(got == Set(
      ("a", ldt("2024-01-01 00:00:00"), 1.0),
      ("a", ldt("2024-01-01 01:00:00"), 1.0),
      ("a", ldt("2024-01-01 02:00:00"), 2.0),
      ("b", ldt("2024-01-01 05:00:00"), 9.0)))
  }

  test("a key spanning more than maxBucketsPerKey fails fast with a named error") {
    val df = Seq(
      (1L, "wide", ts("2024-01-01 00:00:00"), 1.0),
      (2L, "wide", ts("2024-01-01 10:00:00"), 2.0)).toDF("id", "k", "ts", "v")
    val e = intercept[Throwable] {
      Resample.resampleLocf(df, "k", "ts", "v", 3600, Seq(col("id")),
        maxBucketsPerKey = 5).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("maxBucketsPerKey=5") && msgs.contains("wide"))
    // just inside the bound still works
    val ok = Resample.resampleLocf(df, "k", "ts", "v", 3600, Seq(col("id")),
      maxBucketsPerKey = 11).collect()
    assert(ok.length == 11)
  }

  test("reserved/output column collisions are rejected eagerly") {
    val df = Seq((1L, "k", ts("2024-01-01 00:00:00"), 1.0)).toDF("id", "k", "ts", "value_locf")
    intercept[IllegalArgumentException] {
      Resample.resampleLocf(df, "k", "ts", "value_locf", 3600, Seq(col("id")))
    }
  }
}
