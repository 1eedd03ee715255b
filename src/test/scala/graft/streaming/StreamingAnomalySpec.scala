package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import StreamingAnomaly._

class StreamingAnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val window = 5
  private val minPoints = 3

  // key 1: stable baseline then a spike; key 2: short series (warm-up only)
  private def series(key: Long, vs: Seq[Long], seq0: Long = 0L): Seq[Point] =
    vs.zipWithIndex.map { case (v, i) => Point(key, 1000L + i * 10, seq0 + i, v) }
  private val batch1 = series(1L, Seq(100L, 102L, 98L, 101L)) ++ series(2L, Seq(7L, 8L))
  private val batch2 = Seq(Point(1L, 1030L, 3L, 101L)) ++ // replay of key 1's last point
    series(1L, Seq(99L, 500L, 100L), seq0 = 4L).map(p => p.copy(ts = p.ts + 40))

  test("streaming flags across microbatches equal the batch operator; replays are dropped") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sanom")
    val in = tmp.resolve("in").toString
    batch1.toDS().write.parquet(s"$in/b0")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Point]].schema)
      .parquet(s"$in/*").as[Point]
    val query = flags(stream, window, minPoints, z = 3, maxAbsValue = 1000000L)
      .writeStream.format("memory").queryName("sanom_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      batch2.toDS().write.parquet(s"$in/b1")
      query.processAllAvailable()
      val got = spark.table("sanom_out").as[Verdict].collect()
        .sortBy(v => (v.key, v.ts, v.seq))
      // exactly one verdict per distinct point — the replay emitted nothing
      assert(got.length == batch1.size + batch2.size - 1)

      // parity with the batch operator over the union of all points
      val all = (batch1 ++ batch2).map(p => (p.key, p.ts, p.seq, p.value))
        .toDF("k", "ts", "seq", "v").dropDuplicates(Seq("k", "ts", "seq"))
      val batchFlags = graft.operators.Anomaly
        .rollingZFlags(all, Seq("k"), Seq(col("ts"), col("seq")), "v",
          window, minPoints, z = 3, maxAbsValue = 1000000L)
        .select(col("k"), col("ts"), col("seq"), col("n_base"), col("flagged"))
        .as[(Long, Long, Long, Long, Boolean)].collect()
        .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
      got.foreach { v =>
        val (nb, fl) = batchFlags((v.key, v.ts, v.seq))
        assert(v.nBase.toLong == nb && v.flagged == fl,
          s"mismatch at (${v.key}, ${v.ts}, ${v.seq})")
      }
      // the spike was flagged, the baseline was not
      assert(got.filter(_.flagged).map(v => (v.key, v.value)).toSeq == Seq((1L, 500L)))
    } finally query.stop()
  }

  test("batch-mode fold spans the dataset and matches the window operator") {
    val pts = series(3L, Seq(10L, 10L, 10L, 10L, 70L, 10L))
    val got = flags(pts.toDS(), window, minPoints, z = 3, maxAbsValue = 1000L)
      .collect().sortBy(_.seq)
    assert(got.map(_.flagged).toSeq == Seq(false, false, false, false, true, false))
    assert(got.map(_.nBase).toSeq == Seq(0, 1, 2, 3, 4, 5))
  }

  test("overflow guard rejects unsafe configs eagerly") {
    intercept[IllegalArgumentException] {
      flags(spark.emptyDataset[Point], 1000, 2, 1000, Long.MaxValue / 4)
    }
  }
}
