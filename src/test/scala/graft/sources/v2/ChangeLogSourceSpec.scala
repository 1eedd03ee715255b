package graft.sources.v2

import java.nio.file.{Files, Path}
import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChangeLogSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeLog(dir: Path, name: String, lines: String*): Unit = {
    // tmp+rename like a real producer — the source must never read a
    // half-written file
    val tmp = dir.resolve(name + ".tmp")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(tmp, dir.resolve(name))
  }

  /** Drain the stream through foreachBatch into `sink` as
    * (batchId, seq, line_no, value) tuples.
    */
  private def startCollecting(dir: String, checkpoint: String,
                              sink: mutable.Buffer[(Long, String, Long, String)],
                              options: Map[String, String] = Map.empty) = {
    val reader = spark.readStream.format(ChangeLogSource.Name)
      .option("path", dir)
    options.foreach { case (k, v) => reader.option(k, v) }
    reader.load().writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val rows = batch.collect()
          .map(r => (id, r.getString(0), r.getLong(1), r.getString(2)))
        sink.synchronized { sink ++= rows }
        ()
      }
      .start()
  }

  test("micro-batches consume sequence-named files in order, with line numbers") {
    val tmp = Files.createTempDirectory("graft-cl")
    writeLog(tmp, "00000001.jsonl", """{"k":1}""", """{"k":2}""")
    writeLog(tmp, "00000002.jsonl", """{"k":3}""")
    val sink = mutable.Buffer.empty[(Long, String, Long, String)]
    val q = startCollecting(tmp.toString, tmp.resolve("ckpt").toString, sink)
    try {
      q.processAllAvailable()
      assert(sink.map(t => (t._2, t._3, t._4)).sorted == Seq(
        ("00000001.jsonl", 0L, """{"k":1}"""),
        ("00000001.jsonl", 1L, """{"k":2}"""),
        ("00000002.jsonl", 0L, """{"k":3}""")))
      // a new file arriving mid-stream lands in a later batch
      writeLog(tmp, "00000003.jsonl", """{"k":4}""")
      q.processAllAvailable()
      assert(sink.count(_._2 == "00000003.jsonl") == 1)
      // in-flight and hidden files are never read
      Files.writeString(tmp.resolve("00000009.jsonl.tmp"), "nope")
      Files.writeString(tmp.resolve("_SUCCESS"), "")
      q.processAllAvailable()
      assert(!sink.exists(t => t._2.contains("00000009") || t._2 == "_SUCCESS"))
    } finally q.stop()
  }

  test("restart from checkpoint resumes strictly after the committed offset") {
    val tmp = Files.createTempDirectory("graft-cl-resume")
    val ckpt = tmp.resolve("ckpt").toString
    writeLog(tmp, "a-001", "r1")
    writeLog(tmp, "a-002", "r2")
    val sink1 = mutable.Buffer.empty[(Long, String, Long, String)]
    val q1 = startCollecting(tmp.toString, ckpt, sink1)
    try {
      q1.processAllAvailable()
      assert(sink1.map(_._2).toSet == Set("a-001", "a-002"))
    } finally q1.stop()
    // files written while the stream is DOWN, then restart on the same
    // checkpoint: only the new sequence range replays — the WAL offset
    // (highest consumed name) survives the kill
    writeLog(tmp, "a-003", "r3")
    writeLog(tmp, "a-004", "r4")
    val sink2 = mutable.Buffer.empty[(Long, String, Long, String)]
    val q2 = startCollecting(tmp.toString, ckpt, sink2)
    try {
      q2.processAllAvailable()
      assert(sink2.map(_._2).toSet == Set("a-003", "a-004"),
        s"resume must not re-read committed files; got ${sink2.map(_._2).toSet}")
    } finally q2.stop()
  }

  test("maxFilesPerTrigger bounds each micro-batch (admission control)") {
    val tmp = Files.createTempDirectory("graft-cl-admit")
    (1 to 5).foreach(i => writeLog(tmp, f"f$i%03d", s"line$i"))
    val sink = mutable.Buffer.empty[(Long, String, Long, String)]
    val q = startCollecting(tmp.toString, tmp.resolve("ckpt").toString, sink,
      Map("maxFilesPerTrigger" -> "2"))
    try {
      q.processAllAvailable()
      assert(sink.map(_._2).toSet == (1 to 5).map(i => f"f$i%03d").toSet)
      val filesPerBatch = sink.groupBy(_._1).values.map(_.map(_._2).distinct.size)
      assert(filesPerBatch.forall(_ <= 2),
        s"admission control leaked >2 files into a batch: $filesPerBatch")
      assert(filesPerBatch.size >= 3) // 5 files at <=2 per batch
    } finally q.stop()
  }

  test("initialPosition=latest skips the pre-existing log") {
    val tmp = Files.createTempDirectory("graft-cl-latest")
    writeLog(tmp, "old-1", "stale")
    val sink = mutable.Buffer.empty[(Long, String, Long, String)]
    val q = startCollecting(tmp.toString, tmp.resolve("ckpt").toString, sink,
      Map("initialPosition" -> "latest"))
    try {
      q.processAllAvailable()
      assert(sink.isEmpty)
      writeLog(tmp, "old-2", "fresh")
      q.processAllAvailable()
      assert(sink.map(t => (t._2, t._4)) == Seq(("old-2", "fresh")))
    } finally q.stop()
  }

  test("option names are case-insensitive (Spark convention)") {
    val tmp = Files.createTempDirectory("graft-cl-ci")
    (1 to 4).foreach(i => writeLog(tmp, f"f$i%03d", s"line$i"))
    val sink = mutable.Buffer.empty[(Long, String, Long, String)]
    // all-lowercase keys must still engage admission control
    val q = startCollecting(tmp.toString, tmp.resolve("ckpt").toString, sink,
      Map("maxfilespertrigger" -> "1", "initialposition" -> "trim_horizon"))
    try {
      q.processAllAvailable()
      assert(sink.map(_._2).toSet == (1 to 4).map(i => f"f$i%03d").toSet)
      val filesPerBatch = sink.groupBy(_._1).values.map(_.map(_._2).distinct.size)
      assert(filesPerBatch.forall(_ == 1),
        s"lowercased maxfilespertrigger was ignored: $filesPerBatch")
    } finally q.stop()
  }

  test("replay of an admitted batch plans vanished files from the manifest and fails loudly") {
    val tmp = Files.createTempDirectory("graft-cl-replay")
    writeLog(tmp, "s-001", "r1")
    writeLog(tmp, "s-002", "r2")
    val ckpt = tmp.resolve("ckpt").toString
    val stream = new ChangeLogMicroBatchStream(
      tmp.toString, "trim_horizon", None, ckpt)
    val start = stream.initialOffset()
    // admission: both files enter the batch, manifest written before any
    // WAL commit could have happened
    val end = stream.latestOffset(start,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    // retention cleanup races crash-recovery: one admitted file vanishes
    Files.delete(tmp.resolve("s-001"))
    val parts = stream.planInputPartitions(start, end)
    assert(parts.map(_.asInstanceOf[ChangeLogPartition].name).toSet ==
      Set("s-001", "s-002"),
      "replay must plan from the admitted-file manifest, not a re-listing")
    // the vanished file's reader fails at open — the task dies loudly
    intercept[java.io.FileNotFoundException] {
      val r = stream.createReaderFactory()
        .createReader(parts.find(_.asInstanceOf[ChangeLogPartition].name == "s-001").get)
      r.next()
    }
    // a pruned/corrupted manifest is equally loud
    val bogusEnd = ChangeLogOffset("zzz-never-admitted")
    intercept[IllegalStateException] { stream.planInputPartitions(start, bogusEnd) }
    // commit prunes manifests at or below the committed offset
    stream.commit(end)
    intercept[IllegalStateException] { stream.planInputPartitions(start, end) }
  }

  test("corrupt change-log records fail the batch, not vanish") {
    val tmp = Files.createTempDirectory("graft-cl-corrupt")
    val logDir = tmp.resolve("log")
    Files.createDirectories(logDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType)))
    def runOnce(sub: String): Unit = {
      val q = graft.streaming.CdcApply.runFromChangeLog(spark,
        logDir.toString, schema,
        tmp.resolve(s"target-$sub").toString, tmp.resolve(s"ckpt-$sub").toString,
        Seq("id"), "op", _ => Seq(col("seq").desc), triggerMs = 250L)
      try q.processAllAvailable() finally q.stop()
    }
    // malformed JSON → FAILFAST kills the batch
    writeLog(logDir, "000001.jsonl", """{"id":1,"op":"put","seq":1}""", """{"id":2,oops""")
    val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce("a")
    }
    assert(!Files.exists(tmp.resolve("target-a")),
      "a batch containing a corrupt record must not apply")
    // well-formed non-object JSON parses to a null struct under every
    // mode — the explicit guard must catch it
    Files.delete(logDir.resolve("000001.jsonl"))
    writeLog(logDir, "000002.jsonl", """{"id":1,"op":"put","seq":1}""", """123""")
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce("b")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e2).exists(_.contains("corrupt change-log record")),
      s"expected the null-struct guard to fire; got: ${chain(e2)}")
    (e1, e2)
    ()
  }

  test("offset json round-trips names that need escaping") {
    val o = ChangeLogOffset("""we"ird\name""")
    assert(ChangeLogOffset.fromJson(o.json()) == o)
    assert(ChangeLogOffset.fromJson(ChangeLogOffset("").json()) == ChangeLogOffset(""))
  }

  test("cdc apply end-to-end through the change-log stream, including replayed restart") {
    val tmp = Files.createTempDirectory("graft-cl-cdc")
    val logDir = tmp.resolve("log")
    Files.createDirectories(logDir)
    val target = tmp.resolve("target").toString
    val ckpt = tmp.resolve("ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType)))
    writeLog(logDir, "000001.jsonl",
      """{"id":1,"v":"a","op":"put","seq":1}""",
      """{"id":2,"v":"b","op":"put","seq":2}""")
    val q1 = graft.streaming.CdcApply.runFromChangeLog(spark, logDir.toString, schema,
      target, ckpt, Seq("id"), "op", _ => Seq(col("seq").desc), triggerMs = 250L)
    try {
      q1.processAllAvailable()
      val after1 = spark.read.parquet(target).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(after1 == Map(1L -> "a", 2L -> "b"))
    } finally q1.stop()
    // change records written while replication is down: an update, a
    // delete, an insert — the restarted stream applies exactly these
    writeLog(logDir, "000002.jsonl",
      """{"id":1,"v":"a2","op":"put","seq":3}""",
      """{"id":2,"v":"x","op":"delete","seq":4}""",
      """{"id":3,"v":"c","op":"put","seq":5}""")
    val q2 = graft.streaming.CdcApply.runFromChangeLog(spark, logDir.toString, schema,
      target, ckpt, Seq("id"), "op", _ => Seq(col("seq").desc), triggerMs = 250L)
    try {
      q2.processAllAvailable()
      val after2 = spark.read.parquet(target).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(after2 == Map(1L -> "a2", 3L -> "c"))
    } finally q2.stop()
  }
}
