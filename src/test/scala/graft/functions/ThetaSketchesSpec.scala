package graft.functions

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ThetaSketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact mode below nominal entries: estimates and set algebra are exact") {
    // A = {0..99}, B = {50..149}: |A|=100, |B|=100, |A∩B|=50, |A\B|=50, |A∪B|=150
    val df = (0L until 100L).map(("a", _)) ++ (50L until 150L).map(("b", _))
    val parts = ThetaSketches.partials(df.toDF("g", "v"), Seq("g"), "v")
    val a = parts.filter(col("g") === "a").select(col("theta_sketch").as("sa"))
    val b = parts.filter(col("g") === "b").select(col("theta_sketch").as("sb"))
    val row = a.crossJoin(b).select(
      ThetaSketches.estimate(col("sa")).as("na"),
      ThetaSketches.estimate(col("sb")).as("nb"),
      ThetaSketches.estimate(ThetaSketches.intersect(col("sa"), col("sb"))).as("nboth"),
      ThetaSketches.estimate(ThetaSketches.aNotB(col("sa"), col("sb"))).as("nonly"),
      ThetaSketches.estimate(ThetaSketches.union(col("sa"), col("sb"))).as("nunion"))
      .collect().head
    assert(row.getDouble(0) == 100.0 && row.getDouble(1) == 100.0)
    assert(row.getDouble(2) == 50.0 && row.getDouble(3) == 50.0 && row.getDouble(4) == 150.0)
  }

  test("partials round-trip parquet and union-merge equals a direct build") {
    val df = Seq.tabulate(5000)(i => (i % 7, s"user-${i % 900}")).toDF("part", "u")
    val parts = ThetaSketches.partials(df, Seq("part"), "u")
    val dir = Files.createTempDirectory("graft-theta").resolve("parts").toString
    parts.write.parquet(dir)
    val back = spark.read.parquet(dir)
    val merged = ThetaSketches.mergeSketch(back, Seq.empty)
      .select(ThetaSketches.estimate(col("theta_sketch"))).collect().head.getDouble(0)
    val direct = ThetaSketches.partials(df, Seq.empty, "u")
      .select(ThetaSketches.estimate(col("theta_sketch"))).collect().head.getDouble(0)
    assert(merged == direct && merged == 900.0)
  }

  test("string and long values both sketch; estimates stay inside 2% on real data") {
    val ev = graft.Tables.load(spark, TestSpark.sf, "events")
    val byType = ThetaSketches.partials(ev, Seq("event_type"), "user_id")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    val checked = byType.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"),
        ThetaSketches.estimate(col("theta_sketch")).as("est"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val exactN = r.getLong(1).toDouble
      assert(math.abs(r.getDouble(2) - exactN) <= exactN * 0.02,
        s"${r.getString(0)}: est ${r.getDouble(2)} vs exact $exactN")
    }
  }
}
