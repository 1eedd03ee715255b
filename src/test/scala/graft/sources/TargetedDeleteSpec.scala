package graft.sources

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TargetedDeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A clustered multi-file table: file i holds ids [i*100, i*100+99]. */
  private def table(): String = {
    val dir = Files.createTempDirectory("graft-tdel").resolve("t").toString
    (0 until 5).foreach { i =>
      (i * 100 until i * 100 + 100).map(id => (id.toLong, s"row$id"))
        .toDF("id", "payload").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    dir
  }

  private def fileBytes(dir: String): Map[String, Long] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    ParquetSource.listParquetFiles(dir, spark.sparkContext.hadoopConfiguration)
      .map(f => f -> fs.getFileStatus(new Path(f)).getModificationTime).toMap
  }

  test("only files containing the keys are rewritten; others stay byte-identical") {
    val dir = table()
    val before = fileBytes(dir)
    val r = TargetedDelete.delete(spark, dir, "id", Seq(5L, 7L, 205L))
    assert(r == TargetedDelete.Result(filesRewritten = 2, rowsDeleted = 3, filesUntouched = 3))
    val after = fileBytes(dir)
    // the 3 untouched files keep their exact paths and mtimes
    assert(before.keySet.intersect(after.keySet).size == 3)
    before.keySet.intersect(after.keySet).foreach(f => assert(before(f) == after(f)))
    val got = spark.read.parquet(dir)
    assert(got.count() == 497)
    assert(got.filter(col("id").isin(5L, 7L, 205L)).count() == 0)
    assert(got.filter(col("id") === 6L).count() == 1) // neighbors survive
  }

  test("absent keys are a no-op; a fully-matched file becomes an empty replacement") {
    val dir = table()
    assert(TargetedDelete.delete(spark, dir, "id", Seq(99999L)) ==
      TargetedDelete.Result(0, 0L, 5))
    val whole = (400L until 500L).toSeq
    val r = TargetedDelete.delete(spark, dir, "id", whole)
    assert(r.filesRewritten == 1 && r.rowsDeleted == 100L)
    assert(spark.read.parquet(dir).count() == 400)
  }

  test("stats pre-prune restricts the detection scan, result identical") {
    val dir = table()
    val stats = spark.read.parquet(FileStatsIndex.buildAndSave(spark, dir, Seq("id")))
    val r = TargetedDelete.delete(spark, dir, "id", Seq(101L, 102L), Some(stats))
    assert(r.filesRewritten == 1 && r.rowsDeleted == 2)
    assert(spark.read.parquet(dir).filter(col("id").isin(101L, 102L)).isEmpty)
  }

  test("deletePairs: exact pairs go, siblings survive, files pruned by the cluster key") {
    // src-clustered edge table: file i holds src [i*100, i*100+99],
    // each src with dsts src+1 and src+2
    val dir = Files.createTempDirectory("graft-tdel-pairs").resolve("e").toString
    (0 until 5).foreach { i =>
      (i * 100 until i * 100 + 100).flatMap(s =>
        Seq((s.toLong, s.toLong + 1), (s.toLong, s.toLong + 2)))
        .toDF("src", "dst").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    FileStatsIndex.buildAndSave(spark, dir, Seq("src"))
    val before = fileBytes(dir)
    // pairs live in files 0 and 2 only; auto-loaded _stats must keep
    // the other three byte-identical
    val r = TargetedDelete.deletePairs(spark, dir, "src", "dst",
      Seq((5L, 6L), (205L, 207L)))
    assert(r == TargetedDelete.Result(filesRewritten = 2, rowsDeleted = 2,
      filesUntouched = 3))
    val after = fileBytes(dir)
    assert(before.keySet.intersect(after.keySet).size == 3)
    before.keySet.intersect(after.keySet).foreach(f => assert(before(f) == after(f)))
    val got = spark.read.parquet(dir)
    assert(got.count() == 998)
    // exact pairs gone; same-src and same-dst siblings survive
    assert(got.filter(col("src") === 5L && col("dst") === 6L).isEmpty)
    assert(got.filter(col("src") === 5L && col("dst") === 7L).count() == 1)
    assert(got.filter(col("src") === 4L && col("dst") === 6L).count() == 1)
    assert(got.filter(col("src") === 205L).count() == 1)
    // replaying the same pairs is a no-op
    assert(TargetedDelete.deletePairs(spark, dir, "src", "dst",
      Seq((5L, 6L), (205L, 207L))) == TargetedDelete.Result(0, 0L, 5))
    // null components rejected eagerly
    intercept[IllegalArgumentException] {
      TargetedDelete.deletePairs(spark, dir, "src", "dst", Seq((1L, null)))
    }
  }

  test("recovery: post-move marker deletes the original, pre-move marker keeps it") {
    val dir = table()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ParquetSource.listParquetFiles(dir, spark.sparkContext.hadoopConfiguration)
    val victim = files.head
    // fabricate a post-move crash: replacement exists, original still there
    val replacement = new Path(dir, "part-deleted-recovered.parquet")
    fs.rename(new Path(files(1)), replacement) // stand-in replacement content
    val markers = new Path(dir, "_delete"); fs.mkdirs(markers)
    val m = fs.create(new Path(markers, "file_0.json"), true)
    try m.write(s"$replacement\n$victim".getBytes("UTF-8")) finally m.close()
    assert(TargetedDelete.recover(spark, dir) == 1)
    assert(!fs.exists(new Path(victim)) && fs.exists(replacement))
    // pre-move crash: marker names a replacement that never arrived
    val m2dir = new Path(dir, "_delete"); fs.mkdirs(m2dir)
    val survivor = ParquetSource.listParquetFiles(dir,
      spark.sparkContext.hadoopConfiguration).head
    val m2 = fs.create(new Path(m2dir, "file_1.json"), true)
    try m2.write(s"$dir/never-written.parquet\n$survivor".getBytes("UTF-8"))
    finally m2.close()
    assert(TargetedDelete.recover(spark, dir) == 1)
    assert(fs.exists(new Path(survivor)))
  }

  test("recovery tolerates zero-byte and partially-flushed markers") {
    val dir = table()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markers = new Path(dir, "_delete"); fs.mkdirs(markers)
    fs.create(new Path(markers, "file_0.json"), true).close() // zero-byte
    val m = fs.create(new Path(markers, "file_1.json"), true)
    try m.write(s"$dir/never-written.parquet".getBytes("UTF-8")) finally m.close() // one line
    assert(TargetedDelete.recover(spark, dir) == 2)
    assert(spark.read.parquet(dir).count() == 500) // originals intact
    // and a delete after the cleanup works normally
    assert(TargetedDelete.delete(spark, dir, "id", Seq(0L)).rowsDeleted == 1)
  }

  test("deleteAuto routes on key-set size and both routes agree") {
    val dirA = table()
    val dirB = table()
    val keys = Seq(5L, 7L, 205L, 499L)
    // small threshold flips dirB onto the anti-join full-copy route
    val rA = TargetedDelete.deleteAuto(spark, dirA, "id", keys)
    val rB = TargetedDelete.deleteAuto(spark, dirB, "id", keys, inlineMaxKeys = 2)
    assert(rA.filesRewritten == 3 && rA.filesUntouched == 2) // targeted route
    assert(rB.filesRewritten == 5 && rB.filesUntouched == 0) // full-copy route
    assert(rA.rowsDeleted == 4L && rB.rowsDeleted == 4L)
    val a = spark.read.parquet(dirA).as[(Long, String)].collect().toSet
    val b = spark.read.parquet(dirB).as[(Long, String)].collect().toSet
    assert(a == b && a.size == 496)
    assert(!a.exists(r => keys.contains(r._1)))
    // no marker or staging debris on either route
    val fs = new Path(dirB).getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (d <- Seq("_delete", "_rewrite", "_rewrite_staging"))
      assert(!fs.exists(new Path(dirB, d)), s"$d left behind")
  }

  test("anti-join route: null keys survive, duplicate keys count once per row") {
    val dir = Files.createTempDirectory("graft-tdel-aj").resolve("t").toString
    Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"), (Some(1L), "a2"))
      .toDF("id", "payload").coalesce(1).write.parquet(dir)
    val r = TargetedDelete.deleteByAntiJoin(spark, dir, "id", Seq(1L, 1L, 99L))
    assert(r.rowsDeleted == 2L)
    val left = spark.read.parquet(dir).select("payload").as[String].collect().toSet
    assert(left == Set("b", "c"))
  }

  test("rewrite recovery rolls forward: staged parts move in, originals drop") {
    val dir = table()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val originals = ParquetSource.listParquetFiles(dir, spark.sparkContext.hadoopConfiguration)
    // fabricate a crash mid-swap: verified staging exists, marker written,
    // no part moved yet
    val staging = new Path(dir, "_rewrite_staging")
    spark.read.parquet(originals: _*).filter(col("id") =!= 5L)
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val markers = new Path(dir, "_rewrite"); fs.mkdirs(markers)
    val m = fs.create(new Path(markers, "rewrite.json"), true)
    try m.write((staging.toString +: originals).mkString("\n").getBytes("UTF-8"))
    finally m.close()
    assert(TargetedDelete.recoverRewrite(spark, dir) == 1)
    spark.catalog.refreshByPath(dir)
    val got = spark.read.parquet(dir)
    assert(got.count() == 499 && got.filter(col("id") === 5L).isEmpty)
    originals.foreach(o => assert(!fs.exists(new Path(o)), s"original $o survived"))
    assert(!fs.exists(staging) && !fs.exists(markers))
    // idempotent: a second recover is a no-op
    assert(TargetedDelete.recoverRewrite(spark, dir) == 0)
  }

  test("multi-file deletes run a CONSTANT number of jobs, not one per file") {
    // 2-file and 10-file deletes over the same machinery: if the rewrite
    // staged per-file (the old serial loop), job count would grow ~5×
    def jobsFor(nFiles: Int): (Int, Long) = {
      val dir = Files.createTempDirectory("graft-tdel-jobs").resolve("t").toString
      (0 until nFiles).foreach { i =>
        (i * 100 until i * 100 + 100).map(id => (id.toLong, s"row$id"))
          .toDF("id", "payload").coalesce(1).write.mode("append").parquet(dir)
      }
      val keys = (0 until nFiles).map(i => (i * 100 + 1).toLong: Any)
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val r = TargetedDelete.delete(spark, dir, "id", keys)
        assert(r.filesRewritten == nFiles && r.rowsDeleted == nFiles.toLong)
        assert(spark.read.parquet(dir).count() == nFiles * 100L - nFiles)
        // listener events are async; give the bus a moment to drain
        Thread.sleep(500)
        (jobs.get(), r.rowsDeleted)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val (jobs2, _) = jobsFor(2)
    val (jobs10, _) = jobsFor(10)
    // identical job count at 5× the affected files (all staged in one job)
    assert(jobs10 == jobs2, s"job count grew with file count: $jobs2 -> $jobs10")
  }

  test("deleteAuto clamps a caller-raised inlineMaxKeys to delete()'s cap") {
    val dir = Files.createTempDirectory("graft-tdel-clamp").resolve("t").toString
    (0L until 300L).map(id => (id, s"r$id")).toDF("id", "payload")
      .coalesce(1).write.parquet(dir)
    // 100_001 keys with inlineMaxKeys raised above the cap must route to
    // the anti-join arm (the targeted path would reject the key list)
    val keys: Seq[Any] = (0L until 100001L).map(x => x: Any)
    val r = TargetedDelete.deleteAuto(spark, dir, "id", keys, inlineMaxKeys = 200000)
    assert(r.rowsDeleted == 300L)
    assert(spark.read.parquet(dir).isEmpty)
  }

  test("null keys in the table are never deleted; oversized key lists rejected") {
    val dir = Files.createTempDirectory("graft-tdel-n").resolve("t").toString
    Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c")).toDF("id", "payload")
      .coalesce(1).write.parquet(dir)
    val r = TargetedDelete.delete(spark, dir, "id", Seq(1L))
    assert(r.rowsDeleted == 1)
    val left = spark.read.parquet(dir).select("payload").as[String].collect().toSet
    assert(left == Set("b", "c"))
    intercept[IllegalArgumentException](
      TargetedDelete.delete(spark, dir, "id", (1L to 100001L).map(x => x: Any)))
  }

  test("schema-evolved table: rewrite keeps columns present only in some files") {
    // file A: (id, payload); file B adds an evolved column — without a
    // mergeSchema read the one-job rewrite would infer ONE file's schema
    // and silently drop the other's columns from its replacement (a
    // row-count verify can't see it: counts match, columns don't)
    val dir = Files.createTempDirectory("graft-tdel-ev").resolve("t").toString
    (0L until 100L).map(id => (id, s"row$id")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    (100L until 200L).map(id => (id, s"row$id", s"extra$id"))
      .toDF("id", "payload", "evolved")
      .coalesce(1).write.mode("append").parquet(dir)
    // one key per file → BOTH files rewritten in the single staged job
    val r = TargetedDelete.delete(spark, dir, "id", Seq(5L, 105L))
    assert(r == TargetedDelete.Result(filesRewritten = 2, rowsDeleted = 2,
      filesUntouched = 0))
    val got = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(got.columns.toSet == Set("id", "payload", "evolved"))
    assert(got.count() == 198)
    // the evolved column's surviving values are intact, not nulled
    assert(got.filter(col("evolved").isNotNull).count() == 99)
    assert(got.filter(col("id") === 106L).select("evolved").as[String]
      .head() == "extra106")
    // file-A survivors carry null for the column their file never had
    assert(got.filter(col("id") === 6L && col("evolved").isNull).count() == 1)
  }
}
