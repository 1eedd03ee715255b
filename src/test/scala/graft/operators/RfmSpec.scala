package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RfmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recency/frequency/monetary with deterministic best-first scores") {
    val ev = Seq(
      (1L, "2024-01-10 00:00:00", 10.0), // recent, 1 event, low spend
      (2L, "2024-01-01 00:00:00", 50.0), // older, 2 events, high spend
      (2L, "2024-01-05 00:00:00", 60.0),
      (3L, "2024-01-02 00:00:00", 5.0)
    ).map { case (u, t, v) => (u, java.sql.Timestamp.valueOf(t), v) }
      .toDF("user_id", "ts", "value")
    val got = Rfm.scores(ev, "user_id", "ts", "value",
        asOf = lit("2024-01-11").cast("timestamp"), buckets = 3)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, 10.0, 1L, 2L, 2L),   // most recent; mid count tie -> key order
      (2L, 6L, 2L, 110.0, 2L, 1L, 1L),  // most frequent + biggest spend
      (3L, 9L, 1L, 5.0, 3L, 3L, 3L)))
  }
}
