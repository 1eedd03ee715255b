package graft

import graft.config.PipelineConfig

/** Migration executable (reference: com.scylladb.migrator.Migrator main,
  * Migrator.scala:14-44): load + validate config, run the copy pipeline,
  * log redacted config and outcome.
  *
  * Usage: runMain graft.Migrate <config-file> [--audit <idColumn> <auditDir>]
  *
  * `--audit` runs the chain through [[Pipeline.transformAudited]]
  * instead of the batch loop: alongside the target, `auditDir` gets a
  * (id, stage_idx, dropped_by) parquet naming the first stage that
  * dropped every lost row — curation forensics at ~2× the plain run.
  * The audited pass reads the source whole, so it refuses configs with
  * savepoints (the resumable batch loop and per-row attribution don't
  * compose; run forensics as its own non-resumable job).
  */
object Migrate {
  def main(args: Array[String]): Unit = {
    require(args.length == 1 || (args.length == 4 && args(1) == "--audit"),
      "usage: graft.Migrate <config-file> [--audit <idColumn> <auditDir>]")
    val spark = Tables.session("graft-migrate",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val cfg = PipelineConfig.loadFrom(args(0),
        spark.sparkContext.hadoopConfiguration) match {
      case Right(c) => c
      case Left(err) => System.err.println(s"[migrate] invalid config: $err"); sys.exit(2)
    }
    spark.sparkContext.setLogLevel("WARN")
    println(s"[migrate] ${cfg.renderRedacted}")
    try {
      if (args.length == 4) {
        val (idCol, auditDir) = (args(2), args(3))
        require(cfg.savepointsDir.isEmpty,
          "--audit is a whole-source pass: remove savepoints.dir from the config")
        val (kept, audit) = Pipeline.transformAudited(
          Pipeline.read(spark, cfg), cfg, idCol)
        Pipeline.write(kept, cfg)
        audit.write.mode("errorifexists").parquet(auditDir)
        val byStage = spark.read.parquet(auditDir)
          .groupBy("stage_idx", "dropped_by").count()
          .orderBy("stage_idx").collect()
        println(s"[migrate] audited run: ${byStage.map(_.getLong(2)).sum} rows dropped")
        byStage.foreach(r =>
          println(s"[migrate]   stage ${r.getLong(0)} ${r.getString(1)}: ${r.getLong(2)}"))
        return
      }
      // the reference's restart contract (Migrator re-reads the savepoint
      // config on startup): re-running the same command after a crash
      // CONTINUES the copy — resume() merges the newest savepoint's
      // completed-file set and falls through to a plain run when none exists
      val result =
        if (cfg.savepointsDir.isDefined)
          Pipeline.resume(spark, cfg, onSkipSetLoaded = n =>
            if (n > 0) println(s"[migrate] resuming: $n files already completed"))
        else Pipeline.run(spark, cfg)
      println(s"[migrate] rows copied: ${result.rowsCopied}; " +
        s"files completed: ${result.filesCompleted.size}")
      result.validation.foreach { v =>
        val failures = v.count()
        println(s"[migrate] post-copy validation failures: $failures")
        if (failures > 0) sys.exit(1)
      }
    } finally spark.stop()
  }
}
