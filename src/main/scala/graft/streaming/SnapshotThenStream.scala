package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.Pipeline
import graft.config.PipelineConfig

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
}
