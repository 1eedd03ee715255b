package graft.functions

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class KllSketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partials round-trip parquet byte-exactly and merge to the combined stream's quantiles") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .withColumn("day", to_date(col("ts")))
    val parts = KllSketches.partials(ev, Seq("event_type", "day"), "value")
    val dir = Files.createTempDirectory("graft-kll").resolve("parts").toString
    parts.write.parquet(dir)
    val back = spark.read.parquet(dir)
    val a = parts.orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]]("kll_sketch").toSeq))
    val b = back.orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]]("kll_sketch").toSeq))
    assert(a.toSeq == b.toSeq)

    // merged per type: n is EXACT, quantile estimates inside the rank
    // envelope (k=200 -> ~1.65%; assert 3%)
    val merged = KllSketches.mergeQuantiles(back, Seq("event_type"), Seq(0.5, 0.9))
    val exactN = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.collect().foreach { r =>
      val typ = r.getString(0)
      val n = r.getLong(1)
      assert(n == exactN(typ), s"$typ: sketch n $n != exact ${exactN(typ)}")
      val Seq(p50, p90) = r.getSeq[Double](2)
      val vals = ev.filter(col("event_type") === typ)
        .select("value").as[Double].collect().sorted
      def rankOf(q: Double): Double = vals.count(_ <= q).toDouble / vals.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.03, s"$typ p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p90) - 0.9) <= 0.03, s"$typ p90 rank ${rankOf(p90)}")
    }
  }

  test("merge order does not change the envelope; empty input yields null quantiles") {
    val df = Seq.tabulate(2000)(i => (i % 4, i.toDouble)).toDF("g", "v")
    val parts = KllSketches.partials(df, Seq("g"), "v", k = 200)
    val one = KllSketches.mergeQuantiles(parts, Seq.empty, Seq(0.25, 0.75))
    val Seq(q25, q75) = one.collect().head.getSeq[Double](1)
    assert(math.abs(q25 - 500.0) <= 60 && math.abs(q75 - 1500.0) <= 60)

    val empty = KllSketches.partials(
      df.filter(col("v") < 0), Seq.empty[String], "v")
    val qs = empty.select(KllSketches.quantiles(col("kll_sketch"), Seq(0.5)).as("q"))
      .collect().head
    assert(qs.isNullAt(0))
  }

  test("rollup preserves the partials' k: an empty placeholder never caps accuracy") {
    // high-accuracy partials (k=2048); the merge buffer must adopt that
    // k, not clamp to a default — check the merged sketch's normalized
    // rank error stays at the k=2048 envelope, and that a rollup over
    // ZERO sketch rows still yields a valid (empty) artifact
    val df = Seq.tabulate(50000)(i => ("g", i.toDouble)).toDF("g", "v")
    val parts = KllSketches.partials(df, Seq("g"), "v", k = 2048)
    val merged = KllSketches.mergeQuantiles(parts, Seq.empty, Seq(0.5))
      .collect().head
    assert(merged.getLong(0) == 50000L)
    // k=2048 single-sided rank error is ~0.4%; a k=200 clamp would be
    // ~1.65% — assert inside the tight envelope
    assert(math.abs(merged.getSeq[Double](1).head - 25000.0) <= 50000 * 0.008)

    val none = KllSketches.mergeSketch(parts.filter(col("g") === "zz"), Seq.empty)
      .select(KllSketches.sketchN(col("kll_sketch"))).collect().head.getLong(0)
    assert(none == 0L)
  }
}
