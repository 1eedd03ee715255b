package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{HllSketches, KllSketches, ThetaSketches}

/** Incremental sketch-artifact maintenance: per-batch partials merged
  * into a parquet store equal (HLL/theta: exactly; KLL: within the
  * envelope, with EXACT n) a one-shot batch sketch over all the data —
  * batch-cut invariance is what mergeability buys.
  */
class SketchMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batches: Seq[DataFrame] = Seq(
    Seq.tabulate(400)(i => ("a", i % 150, i * 1.0)),
    Seq.tabulate(400)(i => ("a", (i + 100) % 250, (i + 400) * 1.0)),
    Seq.tabulate(300)(i => ("b", i % 90, i * 3.0))
  ).map(_.toDF("g", "u", "v"))

  private def all: DataFrame = batches.reduce(_.unionByName(_))

  test("HLL store maintained per batch equals the one-shot sketch estimate exactly") {
    val store = Files.createTempDirectory("graft-skm").resolve("hll").toString
    batches.foreach { b =>
      SketchMaintenance.mergeIntoStore(
        HllSketches.partials(b, Seq("g"), "u"), store, Seq("g"),
        HllSketches.mergeSketch(_, _))
    }
    val fromStore = HllSketches.mergeEstimate(spark.read.parquet(store), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = HllSketches.mergeEstimate(
        HllSketches.partials(all, Seq("g"), "u"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromStore == oneShot)
    // and exact at these cardinalities (sparse mode)
    assert(fromStore == Map("a" -> 250L, "b" -> 90L))
  }

  test("theta store supports set algebra after incremental maintenance, exact below nominal") {
    val store = Files.createTempDirectory("graft-skm").resolve("theta").toString
    batches.foreach { b =>
      SketchMaintenance.mergeIntoStore(
        ThetaSketches.partials(b, Seq("g"), "u"), store, Seq("g"),
        ThetaSketches.mergeSketch(_, _))
    }
    val s = spark.read.parquet(store)
    val a = s.filter(col("g") === "a").select(col("theta_sketch").as("sa"))
    val b = s.filter(col("g") === "b").select(col("theta_sketch").as("sb"))
    val row = a.crossJoin(b).select(
      ThetaSketches.estimate(ThetaSketches.intersect(col("sa"), col("sb"))).as("nboth"),
      ThetaSketches.estimate(ThetaSketches.aNotB(col("sa"), col("sb"))).as("aonly"))
      .collect().head
    // a's users are 0..249, b's are 0..89 -> both = 90, a-only = 160
    assert(row.getDouble(0) == 90.0 && row.getDouble(1) == 160.0)
  }

  test("KLL store carries the exact combined n and in-envelope quantiles") {
    val store = Files.createTempDirectory("graft-skm").resolve("kll").toString
    batches.foreach { b =>
      SketchMaintenance.mergeIntoStore(
        KllSketches.partials(b, Seq("g"), "v"), store, Seq("g"),
        KllSketches.mergeSketch(_, _))
    }
    val got = KllSketches.mergeQuantiles(spark.read.parquet(store), Seq("g"), Seq(0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2).head)).toMap
    assert(got("a")._1 == 800L && got("b")._1 == 300L)
    // group a values are 0..799 -> median ~400 (3% rank envelope);
    // group b values are 0,3,..,897 -> median ~450
    assert(math.abs(got("a")._2 - 400.0) <= 800 * 0.03)
    assert(math.abs(got("b")._2 - 450.0) <= 900 * 0.03)
  }

  test("partitioned store: a batch re-merges only the partitions it touches") {
    import org.apache.spark.sql.functions.col
    val store = Files.createTempDirectory("graft-skm-part").resolve("hll").toString
    def partials(day: String, users: Range) =
      HllSketches.partials(
        users.map(u => (day, "a", u.toLong)).toDF("day", "g", "u"),
        Seq("day", "g"), "u")
    // day 1 lands, then day 2 + more day 2
    SketchMaintenance.mergeIntoPartitionedStore(
      partials("d1", 0 until 100), store, "day", Seq("day", "g"),
      HllSketches.mergeSketch(_, _))
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def d1Files = fs.listStatus(new org.apache.hadoop.fs.Path(store, "day=d1"))
      .filter(_.isFile).map(s => s.getPath.getName -> s.getModificationTime).toSeq.sorted
    val d1Before = d1Files

    SketchMaintenance.mergeIntoPartitionedStore(
      partials("d2", 0 until 50), store, "day", Seq("day", "g"),
      HllSketches.mergeSketch(_, _))
    SketchMaintenance.mergeIntoPartitionedStore(
      partials("d2", 25 until 80), store, "day", Seq("day", "g"),
      HllSketches.mergeSketch(_, _))

    // day-1 partition files are byte-level untouched by day-2 batches
    assert(d1Files == d1Before, "untouched partition must keep its files")
    val est = HllSketches.mergeEstimate(spark.read.parquet(store), Seq("day"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("d1" -> 100L, "d2" -> 80L))
    // merged across partitions, the artifact answers the any-range form
    val overall = HllSketches.mergeEstimate(spark.read.parquet(store), Seq("g"))
      .collect().head.getLong(1)
    assert(overall == 100L) // user ids overlap across days
  }

  test("maintenance runs from foreachBatch on a live stream") {
    val dir = Files.createTempDirectory("graft-skm-stream")
    val srcDir = dir.resolve("in")
    Files.createDirectories(srcDir)
    val store = dir.resolve("store").toString
    Files.write(srcDir.resolve("b0.json"),
      (0 until 200).map(i => s"""{"g": "a", "u": ${i % 70}}""").mkString("\n").getBytes("UTF-8"))

    val schema = StructType(Seq(StructField("g", StringType), StructField("u", LongType)))
    val q = spark.readStream.schema(schema).json(srcDir.toString)
      .writeStream
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SketchMaintenance.mergeIntoStore(
          HllSketches.partials(batch, Seq("g"), "u"), store, Seq("g"),
          HllSketches.mergeSketch(_, _))
      }
      .start()
    try {
      q.processAllAvailable()
      // second file lands mid-stream; the store must absorb it
      Files.write(srcDir.resolve("b1.json"),
        (0 until 200).map(i => s"""{"g": "a", "u": ${50 + i % 100}}""").mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
    } finally q.stop()

    val est = HllSketches.mergeEstimate(spark.read.parquet(store), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 150L)) // 0..69 ∪ 50..149
  }
}
