package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

case class Click(cuser: Long, cts: Timestamp, page: String)
case class Purchase(puser: Long, pts: Timestamp, amount: Double)

class StreamJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fileStream[T <: Product : org.apache.spark.sql.Encoder](dir: String) =
    spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[T]].schema)
      .parquet(s"$dir/*")

  test("inner interval join matches purchases within the lookback window only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssj")
    val cDir = tmp.resolve("clicks").toString
    val pDir = tmp.resolve("purchases").toString
    Seq(
      Click(1L, ts("2024-01-01 10:00:00"), "home"),
      Click(2L, ts("2024-01-01 10:30:00"), "search")).toDS()
      .write.parquet(s"$cDir/b0")
    Seq(
      Purchase(1L, ts("2024-01-01 09:55:00"), 10.0), // 5 min before click: match
      Purchase(1L, ts("2024-01-01 09:30:00"), 99.0), // 30 min before: outside 10-min lookback
      Purchase(1L, ts("2024-01-01 10:05:00"), 50.0), // after the click: no match
      Purchase(2L, ts("2024-01-01 10:29:00"), 20.0)) // 1 min before: match
      .toDS().write.parquet(s"$pDir/b0")

    val joined = StreamJoins.intervalJoin(
      fileStream[Click](cDir), fileStream[Purchase](pDir),
      "cuser", "puser", "cts", "pts", "5 minutes", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj_inner")
        .select("cuser", "amount").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 10.0), (2L, 20.0)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched clicks after the watermark passes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssj-outer")
    val cDir = tmp.resolve("clicks").toString
    val pDir = tmp.resolve("purchases").toString
    Seq(Click(5L, ts("2024-01-01 10:00:00"), "home")).toDS()
      .write.parquet(s"$cDir/b0")
    Seq(Purchase(6L, ts("2024-01-01 10:00:00"), 1.0)).toDS() // different user
      .write.parquet(s"$pDir/b0")

    val joined = StreamJoins.intervalJoinLeftOuter(
      fileStream[Click](cDir), fileStream[Purchase](pDir),
      "cuser", "puser", "cts", "pts", "1 minutes", "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      // advance both watermarks far past click+interval so the unmatched
      // outer row becomes provably unmatched and is emitted
      Seq(Click(7L, ts("2024-01-01 12:00:00"), "late")).toDS()
        .write.parquet(s"$cDir/b1")
      Seq(Purchase(8L, ts("2024-01-01 12:00:00"), 2.0)).toDS()
        .write.parquet(s"$pDir/b1")
      q.processAllAvailable()
      q.processAllAvailable() // extra batch: outer emission follows the watermark update
      val rows = spark.table("ssj_outer")
        .select("cuser", "amount").collect()
      val unmatched = rows.filter(r => r.getLong(0) == 5L)
      assert(unmatched.length == 1 && unmatched.head.isNullAt(1),
        s"expected click 5 emitted with null amount, got: ${rows.mkString(", ")}")
    } finally q.stop()
  }
}
