package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.config.PipelineConfig
import graft.sources.ParquetSource

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cfgText(in: String, out: String, extra: String = "",
                      mode: String = "overwrite") =
    s"""source.type: parquet
       |source.path: $in
       |target.type: parquet
       |target.path: $out
       |target.mode: $mode
       |$extra""".stripMargin

  test("copy with where + column selection + renames, then validation is clean") {
    val tmp = Files.createTempDirectory("graft-pipe")
    val out = tmp.resolve("out").toString
    val cfg = PipelineConfig.parse(cfgText(s"${TestSpark.sf}/customer.parquet", out,
      """source.where: c_custkey < 100
        |source.columns: c_custkey, c_name
        |renames: c_name->full_name
        |validation.primaryKey: c_custkey
        |validation.compareColumns: full_name
        |""".stripMargin)).toOption.get
    val result = Pipeline.run(spark, cfg)
    assert(result.rowsCopied == 100)
    val tgt = spark.read.parquet(out)
    assert(tgt.columns.toSet == Set("c_custkey", "full_name"))
    assert(tgt.count() == 100)
    assert(result.validation.get.count() == 0) // copy is faithful
  }

  test("source.mergeSchema reads a schema-evolved table; off keeps the footprint") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ms")
    val in = tmp.resolve("in").toString
    // table evolves: old files lack the `score` column
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(s"$in/old")
    Seq((2L, "b", 9L)).toDF("id", "v", "score").coalesce(1).write.parquet(s"$in/new")
    val merged = PipelineConfig.parse(cfgText(in, tmp.resolve("o1").toString,
      "source.mergeSchema: true\n")).toOption.get
    val got = Pipeline.read(spark, merged).orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == Seq((1L, None), (2L, Some(9L))))
    // without the opt-in, the read keeps single-footer schema resolution
    // (whichever file wins, the union column set is NOT guaranteed)
    val plain = PipelineConfig.parse(cfgText(in, tmp.resolve("o2").toString)).toOption.get
    assert(Pipeline.read(spark, plain).count() == 2)
  }

  test("resume: second run with recorded savepoint skips completed files") {
    val tmp = Files.createTempDirectory("graft-resume")
    val in = tmp.resolve("in").toString
    val out = tmp.resolve("out").toString
    val sp = tmp.resolve("sp").toString
    import spark.implicits._
    (1 to 4).foreach(i => Seq((i, s"v$i")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$in/f$i"))
    val files = ParquetSource.listParquetFiles(in, spark.sparkContext.hadoopConfiguration)

    val cfg1 = PipelineConfig.parse(cfgText(in, out,
      s"savepoints.dir: $sp\n", mode = "append")).toOption.get
    val r1 = Pipeline.run(spark, cfg1, fileBatchSize = 2)
    assert(r1.rowsCopied == 4)
    assert(r1.filesCompleted == files.toSet)
    assert(spark.read.parquet(out).count() == 4)

    // the latest (highest-numbered) savepoint records all completed files
    val spFiles = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(java.nio.file.Paths.get(sp)).iterator()).asScala.toSeq
    val latestContent = Files.readString(spFiles.maxBy(_.getFileName.toString))
    assert(files.forall(latestContent.contains))

    // resume: skip 3 of 4 files; only the remaining one is copied
    val cfg2 = PipelineConfig.parse(cfgText(in, tmp.resolve("out2").toString,
      s"skipFiles: ${files.take(3).mkString(", ")}\n")).toOption.get
    val r2 = Pipeline.run(spark, cfg2)
    assert(r2.rowsCopied == 1)
  }

  test("resumed run validates against the full source, not the skip-filtered one") {
    val tmp = Files.createTempDirectory("graft-resume-val")
    val in = tmp.resolve("in").toString
    val out = tmp.resolve("out").toString
    import spark.implicits._
    (1 to 3).foreach(i => Seq((i, s"v$i")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$in/f$i"))
    val files = ParquetSource.listParquetFiles(in, spark.sparkContext.hadoopConfiguration)

    // run 1: full copy
    val cfg1 = PipelineConfig.parse(cfgText(in, out,
      s"savepoints.dir: ${tmp.resolve("sp")}\n", mode = "append")).toOption.get
    assert(Pipeline.run(spark, cfg1).rowsCopied == 3)

    // run 2: everything already copied (skipFiles = all), append mode.
    // Copy phase is a no-op; validation must still see the full source —
    // previously it re-applied skipFiles and either threw (all skipped)
    // or reported the skipped files' rows as extra_target
    val cfg2 = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $in
         |target.type: parquet
         |target.path: $out
         |target.mode: append
         |savepoints.dir: ${tmp.resolve("sp2")}
         |skipFiles: ${files.mkString(", ")}
         |validation.primaryKey: id
         |validation.compareColumns: v
         |""".stripMargin).toOption.get
    val r2 = Pipeline.run(spark, cfg2)
    assert(r2.rowsCopied == 0)
    assert(r2.validation.get.count() == 0) // resumed copy validates clean
  }

  test("partitioned write lays out directories by column and prunes on read") {
    val tmp = Files.createTempDirectory("graft-part")
    val out = tmp.resolve("out").toString
    val cfg = PipelineConfig.parse(cfgText(s"${TestSpark.sf}/orders.parquet", out,
      "target.partitionBy: o_orderstatus\n")).toOption.get
    Pipeline.run(spark, cfg)
    val dirs = new java.io.File(out).list().filter(_.startsWith("o_orderstatus="))
    assert(dirs.length >= 2)
    // partition pruning: the filter on the partition column becomes a
    // PartitionFilters entry, not a data filter
    val pruned = spark.read.parquet(out).filter(col("o_orderstatus") === "O")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(o_orderstatus"))
    assert(pruned.count() > 0)
  }

  test("repair appends exactly the missing rows, idempotently") {
    val tmp = Files.createTempDirectory("graft-repair")
    val out = tmp.resolve("out").toString
    val cfg = PipelineConfig.parse(cfgText(s"${TestSpark.sf}/nation.parquet", out,
      """validation.primaryKey: n_nationkey
        |validation.compareColumns: n_name
        |""".stripMargin)).toOption.get
    Pipeline.run(spark, cfg)
    // drop two rows from the target
    spark.read.parquet(out).filter(col("n_nationkey") >= 2)
      .write.mode("overwrite").parquet(tmp.resolve("out2").toString)
    val cfg2 = cfg.copy(target = cfg.target.asInstanceOf[graft.config.TargetConfig.Parquet]
      .copy(path = tmp.resolve("out2").toString))
    assert(Pipeline.repairMissingRows(spark, cfg2) == 2)
    assert(spark.read.parquet(tmp.resolve("out2").toString).count() ==
      spark.read.parquet(out).count())
    // second repair is a no-op (idempotent)
    assert(Pipeline.repairMissingRows(spark, cfg2) == 0)
  }

  test("target.sortBy clusters rows within each output file") {
    val tmp = Files.createTempDirectory("graft-sortby")
    val out = tmp.resolve("out").toString
    val cfg = PipelineConfig.parse(cfgText(s"${TestSpark.sf}/orders.parquet", out,
      "target.sortBy: o_totalprice\n")).toOption.get
    Pipeline.run(spark, cfg)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val vals = spark.read.parquet(f.toString)
        .select(col("o_totalprice")).collect().map(_.getDouble(0))
      assert(vals.sameElements(vals.sorted), s"${f.getName} not clustered on sort key")
    }
  }

  test("target.maxRecordsPerFile bounds output file size without a shuffle") {
    val tmp = Files.createTempDirectory("graft-maxrec")
    val out = tmp.resolve("out").toString
    val cfg = PipelineConfig.parse(cfgText(s"${TestSpark.sf}/orders.parquet", out,
      "target.maxRecordsPerFile: 100\n")).toOption.get
    Pipeline.run(spark, cfg)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    val total = spark.read.parquet(out).count()
    assert(files.length >= (total / 100).toInt,
      s"expected the writer to roll files every 100 rows: ${files.length} files / $total rows")
    files.foreach { f =>
      val n = spark.read.parquet(f.toString).count()
      assert(n <= 100, s"${f.getName} has $n rows > maxRecordsPerFile")
    }
    // rows survive intact
    assert(total == spark.read.parquet(s"${TestSpark.sf}/orders.parquet").count())
    // invalid values are load-time errors
    assert(PipelineConfig.parse(cfgText("/x", "/y",
      "target.maxRecordsPerFile: -5\n")).isLeft)
  }

  test("dynamo-s3-export arm reads through the connector; skipFiles prunes files") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ddb-arm")
    val root = tmp.resolve("export").toString
    val items = (1 to 60).map(i => s"""{"Item":{"pk":{"S":"id-$i"}}}""")
    graft.sources.DdbTables.writeS3Export(items.toDF("item_json").repartition(3), root)
    val files = graft.sources.v2.DdbExportSource.listDataFiles(root)
    assert(files.size == 3)

    val cfg = PipelineConfig.parse(
      s"""source.type: dynamo-s3-export
         |source.path: $root
         |target.type: parquet
         |target.path: ${tmp.resolve("out")}
         |target.mode: overwrite
         |""".stripMargin).toOption.get
    assert(Pipeline.run(spark, cfg).rowsCopied == 60)

    val resumed = PipelineConfig.parse(
      s"""source.type: dynamo-s3-export
         |source.path: $root
         |target.type: parquet
         |target.path: ${tmp.resolve("out2")}
         |target.mode: overwrite
         |skipFiles: ${files.head._1}
         |""".stripMargin).toOption.get
    assert(Pipeline.run(spark, resumed).rowsCopied == 60 - files.head._2)
  }

  test("csv and json source/target arms round-trip with pushdown semantics") {
    val tmp = Files.createTempDirectory("graft-textfmt")
    val csvDir = tmp.resolve("csv").toString
    val jsonDir = tmp.resolve("json").toString
    val backDir = tmp.resolve("back").toString
    // parquet -> csv
    val toCsv = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/nation.parquet
         |target.type: csv
         |target.path: $csvDir
         |target.mode: overwrite
         |""".stripMargin).toOption.get
    Pipeline.run(spark, toCsv)
    // csv -> json with explicit schema + filter + projection
    val csvToJson = PipelineConfig.parse(
      s"""source.type: csv
         |source.path: $csvDir
         |source.schema: n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT
         |source.where: n_regionkey = 1
         |source.columns: n_nationkey, n_name
         |target.type: json
         |target.path: $jsonDir
         |target.mode: overwrite
         |""".stripMargin).toOption.get
    val r = Pipeline.run(spark, csvToJson)
    assert(r.rowsCopied == 5)
    // json -> parquet, schema'd
    val jsonBack = PipelineConfig.parse(
      s"""source.type: json
         |source.path: $jsonDir
         |source.schema: n_nationkey BIGINT, n_name STRING
         |target.type: parquet
         |target.path: $backDir
         |target.mode: overwrite
         |""".stripMargin).toOption.get
    Pipeline.run(spark, jsonBack)
    val back = spark.read.parquet(backDir)
    assert(back.count() == 5 && back.columns.toSet == Set("n_nationkey", "n_name"))
    // schema-less text sources must demand the explicit inference opt-in
    val noSchema = PipelineConfig.parse(
      s"""source.type: csv
         |source.path: $csvDir
         |target.type: parquet
         |target.path: $backDir
         |""".stripMargin)
    assert(noSchema.isLeft && noSchema.swap.toOption.get.contains("inferSchema"))
  }

  test("target.globalSortBy totally orders rows ACROSS output files") {
    val tmp = Files.createTempDirectory("graft-gsort")
    val out = tmp.resolve("out").toString
    // maxRecordsPerFile composes: AQE coalesces the tiny range exchange
    // to one partition at this SF, so the roll is what yields >1 file —
    // rolled files inherit the task's sort order, keeping ranges disjoint
    val cfg = PipelineConfig.parse(cfgText(s"${TestSpark.sf}/orders.parquet", out,
      "target.globalSortBy: o_totalprice\ntarget.maxRecordsPerFile: 300\n")).toOption.get
    Pipeline.run(spark, cfg)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "need multiple files to prove a cross-file order")
    // within each file rows are sorted; across files the ranges are
    // disjoint: sort files by their min and require max(i) <= min(i+1)
    val ranges = files.map { f =>
      val vals = spark.read.parquet(f.toString)
        .select(col("o_totalprice")).collect().map(_.getDouble(0))
      assert(vals.sameElements(vals.sorted), s"${f.getName} not sorted")
      (vals.min, vals.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "file ranges overlap")
      case _ => ()
    }
    // both sort modes at once is a load-time error
    assert(PipelineConfig.parse(cfgText("/x", "/y",
      "target.sortBy: a\ntarget.globalSortBy: b\n")).isLeft)
  }

  test("orc source/target arms round-trip with pushdown semantics") {
    val tmp = Files.createTempDirectory("graft-orc")
    val orcIn = tmp.resolve("in").toString
    val out = tmp.resolve("out").toString
    // stage an ORC copy of orders
    spark.read.parquet(s"${TestSpark.sf}/orders.parquet").write.orc(orcIn)
    val cfg = PipelineConfig.parse(
      s"""source.type: orc
         |source.path: $orcIn
         |source.where: o_totalprice > 50000
         |source.columns: o_orderkey,o_totalprice
         |target.type: orc
         |target.path: $out
         |target.mode: overwrite
         |target.compression: zstd""".stripMargin).toOption.get
    Pipeline.run(spark, cfg)
    val got = spark.read.orc(out)
    assert(got.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    val expected = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
      .filter(col("o_totalprice") > 50000).count()
    assert(got.count() == expected && expected > 0)
    // the where clause reaches the ORC reader as a pushed filter
    val plan = Pipeline.read(spark, cfg).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"filter not pushed into the orc scan:\n$plan")
    // invalid codec is a load-time error
    assert(PipelineConfig.parse(
      s"source.type: orc\nsource.path: /x\ntarget.type: orc\ntarget.path: /y\n" +
        "target.compression: nope").isLeft)
  }

  test("validation detects a corrupted target") {
    val tmp = Files.createTempDirectory("graft-corrupt")
    val out = tmp.resolve("out").toString
    val cfg = PipelineConfig.parse(cfgText(s"${TestSpark.sf}/nation.parquet", out,
      """validation.primaryKey: n_nationkey
        |validation.compareColumns: n_name
        |""".stripMargin)).toOption.get
    Pipeline.run(spark, cfg)
    // corrupt one row in the target
    val corrupted = spark.read.parquet(out)
      .withColumn("n_name", when(col("n_nationkey") === 0, lit("WRONG"))
        .otherwise(col("n_name")))
    corrupted.write.mode("overwrite").parquet(tmp.resolve("out_bad").toString)
    val cfg2 = cfg.copy(target = cfg.target.asInstanceOf[graft.config.TargetConfig.Parquet]
      .copy(path = tmp.resolve("out_bad").toString))
    // re-validate against the corrupted copy without re-writing: run the
    // validation joins directly
    val src = Pipeline.transform(Pipeline.read(spark, cfg2), cfg2)
    val tgt = spark.read.parquet(tmp.resolve("out_bad").toString)
    val diff = graft.validation.Diff.fullDiff(src, tgt, Seq("n_nationkey"), Seq("n_name"))
      .filter(col("diff_kind") =!= "match").collect()
    assert(diff.length == 1 && diff.head.getString(1) == "mismatch")
  }
}
