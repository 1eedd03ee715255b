package graft.sources.v2

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.{DdbJson, DdbTables, DdbValue}

class DdbExportSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeExport(n: Int): String = {
    val root = Files.createTempDirectory("graft-dsv2").toString
    val items = (1 to n).map { i =>
      DdbJson.encodeItemLine(Map(
        "pk" -> DdbValue.S(s"id-$i"), "n" -> DdbValue.N(i.toString)))
    }
    DdbTables.writeS3Export(items.toDF("item_json").repartition(4), root)
    root
  }

  test("connector read equals the functional reader") {
    val root = writeExport(200)
    val viaConnector = spark.read.format(DdbExportSource.Name)
      .option("path", root).load()
    val viaFunction = DdbTables.readS3Export(spark, root)
    assert(viaConnector.schema == viaFunction.schema)
    assert(viaConnector.exceptAll(viaFunction).isEmpty &&
      viaFunction.exceptAll(viaConnector).isEmpty)
    assert(viaConnector.count() == 200)
  }

  test("skipFiles prunes at planning time: skipped files never become partitions") {
    val root = writeExport(100)
    val all = DdbExportSource.listDataFiles(root)
    assert(all.size > 1, "fixture should produce multiple data files")
    val skip = all.head._1
    val df = spark.read.format(DdbExportSource.Name)
      .option("path", root).option("skipFiles", skip).load()
    assert(df.rdd.getNumPartitions == all.size - 1)
    assert(df.count() == 100 - all.head._2)
  }

  test("statistics come from the manifests (row count without data reads)") {
    val root = writeExport(150)
    val df = spark.read.format(DdbExportSource.Name).option("path", root).load()
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(150)))
    assert(stats.sizeInBytes > 0)
  }
}
