package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton code, bit-by-bit in plain Scala. */
  private def morton(vals: Seq[Long], bits: Int): Long = {
    val n = vals.length
    var z = 0L
    for (i <- 0 until bits; j <- 0 until n)
      z |= (((vals(j) % (1L << bits)) >> i) & 1L) << (i * n + j)
    z
  }

  test("zValue matches the reference Morton code, 2 and 3 dims") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 5L), (0L, 1L, 7L), (3L, 3L, 3L),
      (12345L, 54321L, 999L), (65535L, 65535L, 15L))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(ZOrder.zValue(Seq($"x", $"y"), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got2.toSeq == rows.map(r => morton(Seq(r._1, r._2), 16)))
    val got3 = df.select(ZOrder.zValue(Seq($"x", $"y", $"w"), 4).as("z"))
      .collect().map(_.getLong(0))
    assert(got3.toSeq == rows.map(r => morton(Seq(r._1, r._2, r._3), 4)))
  }

  test("zValueSql is the bit-exact SQL twin of zValue") {
    val df = Seq((7L, 11L), (1000L, 2000L), (65536L, 1L), (0L, 0L))
      .toDF("x", "y")
    val native = df.select(ZOrder.zValue(Seq($"x", $"y"), 16).as("z"))
    val viaSql = df.selectExpr(ZOrder.zValueSql(Seq("x", "y"), 16) + " AS z")
    assert(native.exceptAll(viaSql).isEmpty && viaSql.exceptAll(native).isEmpty)
  }

  test("cluster preserves all rows and honors numFiles partitioning") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val clustered = ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), 16, 4)
    assert(clustered.rdd.getNumPartitions == 4)
    assert(clustered.columns.toSeq == li.columns.toSeq) // __z dropped
    assert(clustered.exceptAll(li).isEmpty && li.exceptAll(clustered).isEmpty)
  }

  test("z-clustered files have tighter per-file bounding boxes than a 1-D sort") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_partkey", "l_suppkey")
    val tmp = Files.createTempDirectory("graft-zorder")
    val zDir = tmp.resolve("z").toString
    val oneDir = tmp.resolve("one").toString
    // scale both dims onto the same bit width first — raw interleave of a
    // ~8-bit partkey with a ~4-bit suppkey puts every high z bit on
    // partkey and degenerates to the 1-D sort this test compares against
    val Array(pkMin, pkMax, skMin, skMax) = li
      .select(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .head().toSeq.map(v => v.toString.toLong).toArray
    val z = ZOrder.zValue(Seq(
      ZOrder.scaleTo(col("l_partkey"), pkMin, pkMax, 16),
      ZOrder.scaleTo(col("l_suppkey"), skMin, skMax, 16)), 16)
    ZOrder.clusterBy(li, z, 8).write.parquet(zDir)
    // 1-D layout: range-partition + sort on the FIRST dimension only
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey").write.parquet(oneDir)

    // z-order doesn't shrink TOTAL bounding-box volume — it balances the
    // per-file spans across dimensions. The payoff is file skipping on
    // the dimension a 1-D sort leaves unclustered: count files whose
    // [min,max] on l_suppkey excludes a point predicate. The partkey
    // sort leaves every file spanning all suppkeys (0 skipped); the z
    // layout quarters the suppkey domain across files.
    def filesSkipped(dir: String, suppkey: Long): (Long, Long) = {
      val perFile = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
      val total = perFile.count()
      val skipped = perFile.filter(lit(suppkey) < col("lo") || lit(suppkey) > col("hi")).count()
      (skipped, total)
    }
    val (zSkip, zTotal) = filesSkipped(zDir, skMax)
    val (oneSkip, _) = filesSkipped(oneDir, skMax)
    assert(oneSkip == 0, s"1-D partkey sort unexpectedly clustered suppkey ($oneSkip skipped)")
    assert(zSkip * 2 >= zTotal,
      s"z-order should let a suppkey point predicate skip >= half the files: $zSkip/$zTotal")
  }
}
