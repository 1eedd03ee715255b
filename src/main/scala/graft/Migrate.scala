package graft

import graft.config.PipelineConfig

/** Migration executable (reference: com.scylladb.migrator.Migrator main,
  * Migrator.scala:14-44): load + validate config, run the copy pipeline,
  * log redacted config and outcome.
  *
  * Usage: runMain graft.Migrate <config-file>
  */
object Migrate {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.Migrate <config-file>")
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
