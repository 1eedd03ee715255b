package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.Pipeline
import graft.config.{PipelineConfig, TargetConfig}

/** Snapshot-then-stream orchestration (reference:
  * alternator/AlternatorMigrator.scala:134-192 — enable stream, copy the
  * initial snapshot, then replicate changes continuously):
  *
  *  1. run the batch snapshot copy through the pipeline runner (resume
  *     and validation semantics included),
  *  2. start the continuous CDC apply against the same target, with
  *     source offsets checkpointed by the engine.
  *
  * Ordering guarantee carried over from the reference: the change feed
  * is at-least-once and the apply is idempotent last-writer-wins, so
  * changes that raced the snapshot re-apply harmlessly.
  */
object SnapshotThenStream {

  final case class Handle(snapshotRows: Long, query: StreamingQuery)

  def run(spark: SparkSession,
          snapshotCfg: PipelineConfig,
          targetPath: String,
          changesDir: String,
          changesSchema: StructType,
          checkpointDir: String,
          pk: Seq[String],
          opCol: String,
          orderCols: DataFrame => Seq[Column],
          triggerMs: Long = 5000L): Handle = {
    val snapshot = Pipeline.run(spark, snapshotCfg)
    val query = CdcApply.run(spark, changesDir, changesSchema, targetPath,
      checkpointDir, pk, opCol, orderCols, triggerMs)
    Handle(snapshot.rowsCopied, query)
  }

  /** Config-driven arm: a pipeline config with a `stream.*` block runs
    * the snapshot copy and then replicates the change feed continuously
    * — the rebuild of the reference's `streamChanges: true` dispatch.
    * The change schema comes from `stream.changesSchema` (a DDL string)
    * when configured — the normal case, since the feed directory is
    * typically EMPTY at snapshot-then-stream startup — and is otherwise
    * inferred from the feed's existing files (SURVEY.md §1.2 "schemas
    * are always discovered"; inference requires at least one file).
    */
  def runFromConfig(spark: SparkSession, cfg: PipelineConfig): Handle = {
    val sc = cfg.stream.getOrElse(
      throw new IllegalArgumentException("config has no stream block"))
    val targetPath = cfg.target match {
      case p: TargetConfig.Parquet => p.path
      case other => throw new IllegalArgumentException(s"unsupported stream target: $other")
    }
    val changesSchema = sc.changesSchema
      .map(StructType.fromDDL)
      .getOrElse(spark.read.parquet(sc.changesDir).schema)
    run(spark, cfg, targetPath, sc.changesDir, changesSchema, sc.checkpointDir,
      sc.primaryKey, sc.opColumn,
      _ => sc.orderBy.map(c => org.apache.spark.sql.functions.col(c).desc),
      sc.triggerMs)
  }
}
