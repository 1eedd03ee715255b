package graft

import org.apache.spark.sql.functions._

import graft.config.{PipelineConfig, TargetConfig}
import graft.validation.{Diff, HashRefinement}

/** Validation executable (reference: com.scylladb.migrator.Validator,
  * Validator.scala:23-38,69-104): join source and target on primary key,
  * report a failure breakdown (missing / extra / mismatched with column
  * attribution), exit non-zero when differences exist.
  *
  * Usage: runMain graft.Validate <config-file> [--repair]
  * (config must carry a parquet target and a validation block;
  * --repair appends source rows missing from the target before the
  * final breakdown, mirroring the reference's copyMissingRows)
  */
object Validate {
  def main(args: Array[String]): Unit = {
    // strict parsing: a typo'd flag must not silently run without repair,
    // and a forgotten config path must not be mistaken for one
    val (flags, positional) = args.partition(_.startsWith("--"))
    require(positional.length == 1 && flags.forall(_ == "--repair"),
      s"usage: graft.Validate <config-file> [--repair] (got: ${args.mkString(" ")})")
    val repair = flags.contains("--repair")
    val spark = Tables.session("graft-validate",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val cfg = PipelineConfig.loadFrom(positional(0),
        spark.sparkContext.hadoopConfiguration) match {
      case Right(c) => c
      case Left(err) => System.err.println(s"[validate] invalid config: $err"); sys.exit(2)
    }
    val v = cfg.validation.getOrElse {
      System.err.println("[validate] config has no validation block"); sys.exit(2)
    }
    val targetPath = cfg.target match {
      case TargetConfig.Parquet(p, _, _, _, _) => p
      case other =>
        System.err.println(s"[validate] unsupported validation target: $other"); sys.exit(2)
    }
    try {
      if (repair) {
        val repaired = Pipeline.repairMissingRows(spark, cfg)
        println(s"[validate] repaired missing rows: $repaired")
      }
      val src = Pipeline.transform(Pipeline.read(spark, cfg), cfg)
      val tgt = spark.read.parquet(targetPath)

      val breakdown = Diff.fullDiff(src, tgt, v.primaryKey, v.compareColumns)
        .groupBy("diff_kind").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val failures = breakdown.view.filterKeys(_ != "match").values.sum
      println(s"[validate] breakdown: " + breakdown.toSeq.sorted
        .map { case (k, n) => s"$k=$n" }.mkString(", "))

      if (breakdown.getOrElse("mismatch", 0L) > 0) {
        val attributed = HashRefinement.refine(src, tgt, v.primaryKey, v.compareColumns)
        Diff.sampleFailures(attributed, v.failuresToFetch).foreach { row =>
          println(s"[validate] mismatch sample: $row")
        }
      }
      if (failures > 0) sys.exit(1)
    } finally spark.stop()
  }
}
