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
      case p: TargetConfig.Parquet => p.path
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

      val diff = Diff.categorizedDiff(src, tgt, v.primaryKey, v.compareColumns)
      val breakdown = Diff.categoryBreakdown(diff)
      println(s"[validate] breakdown: " + renderBreakdown(breakdown))

      val valueDiffs = Seq("differing_field_values", "differing_ttls",
        "differing_writetimes", "numeric_type_mismatch")
        .map(breakdown.getOrElse(_, 0L)).sum
      if (valueDiffs > 0) {
        val attributed = HashRefinement.refine(src, tgt, v.primaryKey, v.compareColumns)
        Diff.sampleFailures(attributed, v.failuresToFetch).foreach { row =>
          println(s"[validate] mismatch sample: $row")
        }
      }
      if (exitCodeFor(breakdown) != 0) sys.exit(exitCodeFor(breakdown))
    } finally spark.stop()
  }

  /** The reference's category order (Validator.scala:85-100), zeros
    * elided except `match` so a fully-green run still prints evidence.
    */
  private[graft] def renderBreakdown(b: Map[String, Long]): String = {
    val order = Seq("missing_target", "extra_target", "differing_field_values",
      "numeric_type_mismatch", "differing_ttls", "differing_writetimes", "match")
    order.filter(k => b.getOrElse(k, 0L) > 0 || k == "match")
      .map(k => s"$k=${b.getOrElse(k, 0L)}").mkString(", ")
  }

  /** Non-zero exactly when any failure category is non-empty — the
    * reference's System.exit(1) contract (Validator.scala:103).
    */
  private[graft] def exitCodeFor(b: Map[String, Long]): Int =
    if ((b - "match").valuesIterator.sum > 0) 1 else 0
}
