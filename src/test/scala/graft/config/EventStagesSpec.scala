package graft.config

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Pipeline, TestSpark}

/** Event-analytics stages on the declarative `transforms:` surface —
  * the round-9 gap closure: funnel / retention / sessionize / SCD2
  * history / point-in-time / merge were Scala-API-only; here each runs
  * from a parsed config through `Pipeline.run`, and chained pipelines
  * (history -> enrich, snapshot -> merge) compose via parquet paths.
  */
class EventStagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-evt").resolve("out").toString

  private def cfg(text: String): PipelineConfig =
    PipelineConfig.parse(text).fold(e => fail(s"parse failed: $e"), identity)

  private def runTo(text: String): String = {
    val c = cfg(text)
    Pipeline.run(spark, c)
    c.target.asInstanceOf[TargetConfig.Parquet].path
  }

  private def eventsCfg(out: String, extra: String): String =
    s"""source.type: parquet
       |source.path: ${TestSpark.sf}/events.parquet
       |target.type: parquet
       |target.path: $out
       |target.mode: overwrite
       |$extra""".stripMargin

  test("sessionize stage from config extends the schema with session_seq") {
    val out = runTo(eventsCfg(tmp(),
      """transforms: sessionize
        |transform.sessionize.keys: user_id
        |transform.sessionize.tsColumn: ts
        |transform.sessionize.gap: 30 minutes
        |transform.sessionize.tieBreak: event_id
        |""".stripMargin))
    val got = spark.read.parquet(out)
    val events = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    assert(got.columns.toSeq == events.columns.toSeq :+ "session_seq")
    assert(got.count() == events.count())
    val expect = graft.operators.Sessionize
      .sessionize(events, Seq("user_id"), "ts", "30 minutes", Seq(col("event_id")))
    assert(got.join(expect,
      got("event_id") === expect("event_id") &&
        got("session_seq") === expect("session_seq"), "left_anti").count() == 0)
  }

  test("funnel stage from config is the stepCounts terminal reshape") {
    val out = runTo(eventsCfg(tmp(),
      """transforms: funnel
        |transform.funnel.keyColumn: user_id
        |transform.funnel.tsColumn: ts
        |transform.funnel.typeColumn: event_type
        |transform.funnel.steps: signup, click, purchase
        |""".stripMargin))
    val got = spark.read.parquet(out)
      .orderBy("step").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val events = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val expect = graft.operators.Funnel
      .stepCounts(events, "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
      .orderBy("step").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
    assert(got.length == 3 && got.head._3 >= got.last._3) // monotone curve
  }

  test("retention stage from config is the cohort grid") {
    val out = runTo(eventsCfg(tmp(),
      """transforms: retention
        |transform.retention.keyColumn: user_id
        |transform.retention.tsColumn: ts
        |transform.retention.bucketDays: 7
        |""".stripMargin))
    val got = spark.read.parquet(out)
    val events = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val expect = graft.operators.Retention.cohortRetention(events, "user_id", "ts", 7)
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("chained pipelines: scd2History writes a history pitEnrich consumes") {
    // pipeline 1: CDC-ish log (purchase=upsert, error=delete) -> history
    val histPath = runTo(eventsCfg(tmp(),
      """source.where: event_type IN ('purchase', 'error')
        |transforms: scd2History
        |transform.scd2History.keyColumn: user_id
        |transform.scd2History.tsColumn: ts
        |transform.scd2History.opColumn: event_type
        |transform.scd2History.upsertOp: purchase
        |transform.scd2History.deleteOp: error
        |transform.scd2History.valueColumns: value
        |transform.scd2History.tieBreak: event_id
        |""".stripMargin))
    val hist = spark.read.parquet(histPath)
    assert(hist.columns.toSeq == Seq("user_id", "value", "valid_from", "valid_to", "is_current"))
    // at most one current version per key
    assert(hist.filter(col("is_current")).groupBy("user_id").count()
      .filter(col("count") > 1).isEmpty)

    // pipeline 2: click facts enriched point-in-time from that history
    val out = runTo(eventsCfg(tmp(),
      s"""source.where: event_type = 'click'
         |source.columns: event_id, user_id, ts
         |transforms: pitEnrich
         |transform.pitEnrich.historyPath: $histPath
         |transform.pitEnrich.keyColumn: user_id
         |transform.pitEnrich.tsColumn: ts
         |transform.pitEnrich.valueColumns: value
         |""".stripMargin))
    val got = spark.read.parquet(out)
    assert(got.columns.contains("pit_value"))
    val events = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val facts = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val expect = graft.operators.Scd2.pointInTime(facts, hist, "user_id", "ts", Seq("value"))
    assert(got.count() == facts.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("scd2Append stage absorbs new ops into a persisted history incrementally") {
    // history of the first half of the month
    val histPath = runTo(eventsCfg(tmp(),
      """source.where: event_type IN ('purchase', 'error') AND ts <= '2024-01-15'
        |transforms: scd2History
        |transform.scd2History.keyColumn: user_id
        |transform.scd2History.tsColumn: ts
        |transform.scd2History.opColumn: event_type
        |transform.scd2History.upsertOp: purchase
        |transform.scd2History.deleteOp: error
        |transform.scd2History.valueColumns: value
        |transform.scd2History.tieBreak: event_id
        |""".stripMargin))
    // second half absorbs through scd2Append into a NEW history path
    val nextPath = runTo(eventsCfg(tmp(),
      s"""source.where: event_type IN ('purchase', 'error') AND ts > '2024-01-15'
         |transforms: scd2Append
         |transform.scd2Append.historyPath: $histPath
         |transform.scd2Append.keyColumn: user_id
         |transform.scd2Append.tsColumn: ts
         |transform.scd2Append.opColumn: event_type
         |transform.scd2Append.upsertOp: purchase
         |transform.scd2Append.deleteOp: error
         |transform.scd2Append.valueColumns: value
         |transform.scd2Append.tieBreak: event_id
         |""".stripMargin))
    val got = spark.read.parquet(nextPath)
    val events = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val full = graft.operators.Scd2.buildHistory(
      events.filter(col("event_type").isin("purchase", "error"))
        .select("user_id", "event_id", "ts", "event_type", "value"),
      "user_id", "ts", "event_type", "purchase", "error",
      Seq("value"), Seq(col("event_id")))
    assert(got.exceptAll(full.select(got.columns.map(col).toIndexedSeq: _*)).isEmpty &&
      full.select(got.columns.map(col).toIndexedSeq: _*).exceptAll(got).isEmpty)
  }

  test("mergeSnapshot stage syncs a persisted snapshot from the piped source") {
    import spark.implicits._
    val snapPath = tmp()
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "v").write.parquet(snapPath)
    val srcPath = tmp()
    Seq((2L, "B", 21L), (4L, "d", 40L))
      .toDF("id", "name", "v").write.parquet(srcPath)

    // deleteStale=false: pure upsert — 1 and 3 persist
    val up = runTo(
      s"""source.type: parquet
         |source.path: $srcPath
         |target.type: parquet
         |target.path: ${tmp()}
         |target.mode: overwrite
         |transforms: mergeSnapshot
         |transform.mergeSnapshot.snapshotPath: $snapPath
         |transform.mergeSnapshot.keys: id
         |""".stripMargin)
    val gotUp = spark.read.parquet(up).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(gotUp == Seq((1L, "a", 10L), (2L, "B", 21L), (3L, "c", 30L), (4L, "d", 40L)))

    // deleteStale=true: full snapshot sync — target-only keys drop
    val sync = runTo(
      s"""source.type: parquet
         |source.path: $srcPath
         |target.type: parquet
         |target.path: ${tmp()}
         |target.mode: overwrite
         |transforms: mergeSnapshot
         |transform.mergeSnapshot.snapshotPath: $snapPath
         |transform.mergeSnapshot.keys: id
         |transform.mergeSnapshot.deleteStale: true
         |""".stripMargin)
    val gotSync = spark.read.parquet(sync).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(gotSync == Seq((2L, "B", 21L), (4L, "d", 40L)))
  }

  test("event stage configs validate eagerly") {
    def parseErr(extra: String): String =
      PipelineConfig.parse(
        s"""source.type: parquet
           |source.path: x
           |target.type: parquet
           |target.path: y
           |$extra""".stripMargin).swap.getOrElse(fail("expected a parse error"))
    assert(parseErr(
      """transforms: funnel
        |transform.funnel.keyColumn: user_id
        |transform.funnel.tsColumn: ts
        |transform.funnel.typeColumn: event_type
        |""".stripMargin).contains("funnel.steps required"))
    assert(parseErr(
      """transforms: funnel
        |transform.funnel.keyColumn: user_id
        |transform.funnel.tsColumn: ts
        |transform.funnel.typeColumn: event_type
        |transform.funnel.steps: a, a
        |""".stripMargin).contains("duplicate step"))
    assert(parseErr(
      """transforms: retention
        |transform.retention.keyColumn: user_id
        |transform.retention.tsColumn: ts
        |transform.retention.bucketDays: 0
        |""".stripMargin).contains("bucketDays must be >= 1"))
    assert(parseErr(
      """transforms: sessionize
        |transform.sessionize.tsColumn: ts
        |transform.sessionize.gap: 30 minutes
        |""".stripMargin).contains("sessionize.keys required"))
    assert(parseErr(
      """transforms: scd2History
        |transform.scd2History.keyColumn: k
        |transform.scd2History.tsColumn: ts
        |transform.scd2History.opColumn: op
        |transform.scd2History.upsertOp: same
        |transform.scd2History.deleteOp: same
        |transform.scd2History.valueColumns: v
        |""".stripMargin).contains("upsertOp and deleteOp must differ"))
    assert(parseErr(
      """transforms: pitEnrich
        |transform.pitEnrich.historyPath: /h
        |transform.pitEnrich.keyColumn: k
        |transform.pitEnrich.tsColumn: ts
        |""".stripMargin).contains("pitEnrich.valueColumns required"))
    assert(parseErr(
      """transforms: mergeSnapshot
        |transform.mergeSnapshot.snapshotPath: /s
        |""".stripMargin).contains("mergeSnapshot.keys required"))
  }
}
