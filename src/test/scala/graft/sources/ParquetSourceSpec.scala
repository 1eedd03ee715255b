package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ParquetSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def setup(): (String, Seq[String]) = {
    val root = Files.createTempDirectory("graft-pq").toString
    (1 to 4).foreach { i =>
      Seq((i, s"row$i")).toDF("id", "v")
        .coalesce(1).write.parquet(s"$root/part$i")
    }
    val files = ParquetSource.listParquetFiles(root, spark.sparkContext.hadoopConfiguration)
    (root, files)
  }

  test("recursive listing finds exactly the parquet data files, sorted") {
    val (_, files) = setup()
    assert(files.size == 4)
    assert(files == files.sorted)
    assert(files.forall(_.endsWith(".parquet")))
  }

  test("skip-set pruning excludes completed files") {
    val (root, files) = setup()
    val all = ParquetSource.readSkipping(spark, root, Set.empty)
    assert(all.count() == 4)
    val skipped = ParquetSource.readSkipping(spark, root, Set(files.head, files(1)))
    assert(skipped.count() == 2)
  }

  test("batched resume loop reports completions and processes everything once") {
    val (root, files) = setup()
    var processed = 0L
    var completed = Vector.empty[String]
    ParquetSource.processInBatches(spark, root, Set(files.head), batchSize = 2) { df =>
      processed += df.count()
    } { batch => completed ++= batch }
    assert(processed == 3) // one file skipped
    assert(completed.toSet == files.toSet - files.head)
    assert(completed.size == 3)
  }
}
