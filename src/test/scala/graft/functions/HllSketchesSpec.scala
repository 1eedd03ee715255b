package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HllSketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = (1 to 2000).map(i => (s"g${i % 2}", s"d${i % 5}", i.toLong % 700))

  test("merged partial sketches estimate within the lgK=12 envelope") {
    val df = rows.toDF("g", "day", "v")
    val parts = HllSketches.partials(df, Seq("g", "day"), "v")
    assert(parts.count() == 10) // 2 groups × 5 days
    val est = HllSketches.mergeEstimate(parts, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("g").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, n) <- exact)
      assert(math.abs(est(g) - n) <= math.max(1L, (n * 0.05).toLong),
        s"group $g: est ${est(g)} vs exact $n")
  }

  test("sketches survive a parquet round trip byte-exactly and still merge") {
    val df = rows.toDF("g", "day", "v")
    val parts = HllSketches.partials(df, Seq("g", "day"), "v")
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    parts.write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val before = parts.select("g", "day", "hll_sketch").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val after = loaded.select("g", "day", "hll_sketch").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(before == after)
    val est = HllSketches.mergeEstimate(loaded, Seq("g")).collect()
    assert(est.length == 2 && est.forall(_.getLong(1) > 0))
  }

  test("union of disjoint partials tracks a one-pass sketch within the envelope") {
    val a = (1 to 500).map(i => ("g", "d1", i.toLong)).toDF("g", "day", "v")
    val b = (501 to 900).map(i => ("g", "d2", i.toLong)).toDF("g", "day", "v")
    val merged = HllSketches.mergeEstimate(
        HllSketches.partials(a.union(b), Seq("g", "day"), "v"), Seq("g"))
      .head().getLong(1)
    val onePass = HllSketches.mergeEstimate(
        HllSketches.partials(a.union(b), Seq("g"), "v"), Seq("g"))
      .head().getLong(1)
    // the union target's register representation may differ from the
    // one-pass sketch's, so estimates agree within the lgK=12 envelope
    // of exact (900), not bit-for-bit
    assert(math.abs(merged - 900) <= 45, s"merged $merged")
    assert(math.abs(onePass - 900) <= 45, s"onePass $onePass")
  }

  test("lgK bounds and output-column collisions are rejected eagerly") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] { HllSketches.partials(df, Seq("g"), "v", lgK = 3) }
    intercept[IllegalArgumentException] {
      HllSketches.partials(df.withColumnRenamed("v", "hll_sketch"), Seq("g"), "hll_sketch")
    }
  }
}
