package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Change-data-capture apply, re-expressed on Structured Streaming.
  *
  * Reference behavior (writers/DynamoStreamReplication.scala:42-164 +
  * the spark-kinesis-dynamodb receiver): a DStream of change records
  * `(op ∈ {put, delete}, key, item)` applied per 5 s microbatch with
  * idempotent PutItem/DeleteItem — at-least-once, last-writer-wins.
  *
  * Here: `readStream` → `foreachBatch`, with source-offset checkpointing
  * replacing the KCL lease table (SURVEY.md §2.12). The apply itself is
  * `applyBatch`, shared between streaming and batch backfill so the two
  * paths cannot diverge; semantics stay at-least-once + idempotent
  * upsert, which also makes Spark's task retries safe.
  */
object CdcApply {

  /** Last-writer-wins: keep the newest record per key. `orderCols` break
    * the tie (e.g. ts desc, seq desc). This is the core upsert-resolution
    * operator; it shuffles once on the key.
    */
  def latestByKey(df: DataFrame, pk: Seq[String], orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Merge one batch of changes into the current table state.
    * Changes carry an `op` column ("put"/"delete"); last change per key
    * within the batch wins; deletes remove the key.
    */
  def applyBatch(current: DataFrame, changes: DataFrame, pk: Seq[String],
                 opCol: String, orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val effective = latestByKey(changes, pk, orderCols)
    val puts = effective.filter(col(opCol) === "put").drop(opCol)
    val allKeys = effective.select(pk.map(col): _*)
    // rows whose key saw any change are replaced (or dropped, if delete)
    current.join(allKeys, pk, "left_anti").unionByName(puts)
  }

  /** Change-feed EXTRACTION — the inverse of [[applyBatch]]: diff two
    * keyed snapshots into the minimal op log that turns `prev` into
    * `next` (rows added or changed → `put` carrying next's values;
    * rows gone → `delete` carrying the key with null payload). The
    * batch-snapshot world's CDF: backfill a change-log pipeline from
    * snapshots, ship deltas instead of full copies, feed the same
    * `applyBatch` downstream.
    *
    * Round-trip law (spec'd): `applyBatch(prev, changesBetween(prev,
    * next)) == next` row-for-row. ONE full-outer join on the key, both
    * sides hashed once; unchanged rows drop out scan-side so the
    * output is delta-sized, not snapshot-sized.
    */
  def changesBetween(prev: DataFrame, next: DataFrame, pk: Seq[String],
                     opCol: String = "op"): DataFrame = {
    require(prev.columns.toSeq == next.columns.toSeq,
      s"snapshots must share a schema: ${prev.columns.toSeq} vs ${next.columns.toSeq}")
    require(!prev.columns.contains(opCol), s"$opCol collides with a snapshot column")
    val valueCols = prev.columns.filterNot(pk.contains).toSeq
    val p = prev.select(prev.columns.map(col).toIndexedSeq :+ lit(true).as("__p"): _*)
    val n = next.select(next.columns.map(col).toIndexedSeq :+ lit(true).as("__n"): _*)
    val joined = p.as("p").join(n.as("n"),
      pk.map(k => col(s"p.$k") <=> col(s"n.$k")).reduce(_ && _), "full_outer")
    val inPrev = col("p.__p").isNotNull
    val inNext = col("n.__n").isNotNull
    val changed =
      if (valueCols.isEmpty) lit(false)
      else !valueCols.map(c => col(s"p.$c") <=> col(s"n.$c")).reduce(_ && _)
    joined
      .filter(!inPrev || !inNext || changed)
      .select(
        pk.map(k => coalesce(col(s"n.$k"), col(s"p.$k")).as(k)) ++
          valueCols.map(c => when(inNext, col(s"n.$c")).as(c)) :+
          when(inNext, lit("put")).otherwise(lit("delete")).as(opCol): _*)
  }

  /** The per-batch merge into a parquet target, shared by both feed
    * shapes below. The target is rewritten per batch (local test shape);
    * a real deployment points `applyBatch` at an upsert-capable sink and
    * keeps the same merge logic.
    */
  private[streaming] def mergeBatchIntoParquet(batch: DataFrame, targetPath: String,
                                    changesSchema: org.apache.spark.sql.types.StructType,
                                    pk: Seq[String], opCol: String,
                                    orderCols: DataFrame => Seq[org.apache.spark.sql.Column]): Unit = {
    val current = SwapStore.readCurrent(batch.sparkSession, targetPath,
      org.apache.spark.sql.types.StructType(changesSchema.filterNot(_.name == opCol)))
    SwapStore.swapWrite(
      applyBatch(current, batch, pk, opCol, orderCols(batch)), targetPath)
  }

  /** Continuous apply: parquet-file change feed → foreachBatch merge into
    * a parquet target.
    */
  def run(spark: SparkSession, changesDir: String, changesSchema: org.apache.spark.sql.types.StructType,
          targetPath: String, checkpointDir: String, pk: Seq[String], opCol: String,
          orderCols: DataFrame => Seq[org.apache.spark.sql.Column],
          triggerMs: Long = 5000L): StreamingQuery = {
    val changes = spark.readStream.schema(changesSchema).parquet(changesDir)
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatchIntoParquet(batch, targetPath, changesSchema, pk, opCol, orderCols)
      }
      .start()
  }

  /** Continuous apply fed by the custom change-log MicroBatchStream
    * (graft.sources.v2.ChangeLogSource) — the full portable analog of
    * the reference's Kinesis→DynamoDB replication loop: sequence-named
    * JSON-lines files in, offset-checkpointed micro-batches, idempotent
    * last-writer-wins merge out. `changesSchema` describes the JSON
    * payload (must include `opCol` and the pk columns); records that
    * fail to parse fail the batch (PERMISSIVE would silently drop
    * changes — corrupt feed data must stop replication, as in the
    * reference's fail-fast record processor).
    */
  def runFromChangeLog(spark: SparkSession, changesDir: String,
                       changesSchema: org.apache.spark.sql.types.StructType,
                       targetPath: String, checkpointDir: String, pk: Seq[String], opCol: String,
                       orderCols: DataFrame => Seq[org.apache.spark.sql.Column],
                       triggerMs: Long = 5000L,
                       initialPosition: String = "trim_horizon",
                       maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
      .format(graft.sources.v2.ChangeLogSource.Name)
      .option("path", changesDir)
      .option("initialPosition", initialPosition)
    // FAILFAST throws on malformed JSON; the null-struct guard catches
    // what FAILFAST cannot (a well-formed non-object like `null` or
    // `123`, which parses to a null struct under every mode). Without
    // both, a corrupt record yields an all-null row whose op matches
    // neither arm and whose null pk never joins — silently swallowed.
    val changes = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .load()
      .select(col("value"),
        from_json(col("value"), changesSchema, Map("mode" -> "FAILFAST")).as("r"))
      .select(when(col("r").isNull, raise_error(concat(
          lit("corrupt change-log record: "), coalesce(col("value"), lit("<null>")))))
        .otherwise(col("r")).as("r"))
      .select(col("r.*"))
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatchIntoParquet(batch, targetPath, changesSchema, pk, opCol, orderCols)
      }
      .start()
  }
}
