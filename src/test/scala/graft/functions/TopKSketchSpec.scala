package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TopKSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketchItems(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int): Seq[(String, Long, Long)] =
    df.agg(TopKSketch.topK(col("v"), k, cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count_est"), col("e.max_err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("exact when distinct items fit the capacity") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++ Seq.fill(5)("d"))
      .toDF("v").repartition(8) // force partial + merge across partitions
    val got = sketchItems(df, k = 3, cap = 16)
    assert(got == Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 20L, 0L)))
  }

  test("heavy hitters survive eviction pressure and bound the error") {
    // 4 heavy items + 200 distinct light items through a 16-entry buffer
    val heavy = Seq.fill(300)("h1") ++ Seq.fill(250)("h2") ++ Seq.fill(200)("h3") ++ Seq.fill(150)("h4")
    val light = (1 to 200).map(i => s"light$i")
    val df = scala.util.Random.shuffle(heavy ++ light).toDF("v").repartition(8)
    val n = heavy.size + light.size
    val got = sketchItems(df, k = 16, cap = 16)
    val items = got.map(_._1).toSet
    // guarantee: true count > n/capacity  =>  present
    Seq("h1", "h2", "h3", "h4").foreach(h => assert(items.contains(h), s"$h missing"))
    // estimate bounds: true <= est <= true + err
    val trueCounts = Map("h1" -> 300L, "h2" -> 250L, "h3" -> 200L, "h4" -> 150L)
    got.filter(g => trueCounts.contains(g._1)).foreach { case (i, est, err) =>
      assert(est >= trueCounts(i) && est - err <= trueCounts(i), s"$i: est=$est err=$err")
    }
    assert(got.size <= 16)
    assert(n / 16 < 150) // the guarantee premise actually holds in this fixture
  }

  test("items beyond 64 KB survive partial-aggregate serialization") {
    val big = "x" * 100000 // writeUTF would throw UTFDataFormatException here
    val df = (Seq.fill(5)(big) ++ Seq("small")).toDF("v").repartition(4)
    val got = sketchItems(df, k = 2, cap = 8)
    assert(got.head == (big, 5L, 0L))
  }

  test("nulls are ignored") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("v")
    val got = sketchItems(df, k = 1, cap = 4)
    assert(got == Seq(("a", 2L, 0L)))
  }
}
