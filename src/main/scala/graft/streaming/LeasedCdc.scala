package graft.streaming

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.streaming.ShardLeases.LeaseCoordinator

/** Lease-coordinated multi-reader CDC apply — the fleet shape of the
  * reference's replication loop (spark-kinesis-dynamodb runs one KCL
  * Worker per Spark receiver; the KCL divides stream shards among
  * workers, fails over dead workers, and resumes each shard from its
  * DynamoDB-lease-table checkpoint). Here the same protocol runs over a
  * SHARDED changelog: a root directory holding one change-log directory
  * per shard (`<root>/<shardId>/<seq>.jsonl`, names lexicographically
  * increasing exactly like ChangeLogSource), and N cooperating readers
  * each driving a [[ShardLeases.LeaseCoordinator]].
  *
  * Contract (the DynamoDB-streams contract): a key lives in exactly ONE
  * shard, so per-shard apply order is total per key and shard targets
  * (`<targetRoot>/<shardId>`) never see cross-reader writes — the lease
  * makes a shard single-writer, and the merge stays idempotent
  * last-writer-wins so the at-least-once window around a steal (thief
  * replays files the victim merged but never checkpointed) converges to
  * the same state.
  *
  * Scale shape: each reader is one Spark application; a poll cycle does
  * one bounded file listing per owned shard and one batch read of ONLY
  * the files past the shard's checkpoint — no full-log rescans. The
  * record count per cycle rides an `observe()` on the merge write (no
  * second pass over the batch).
  */
object LeasedCdc {

  /** Shard ids = the root's subdirectory names, sorted (every reader
    * must see the same id universe — it is the lease key space).
    */
  def listShards(spark: SparkSession, root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).toSeq.sorted
  }

  /** One reader of the fleet. Call [[pollOnce]] on the heartbeat cadence
    * (well inside the coordinator's failover window — each poll renews
    * every held lease). `orderCols` resolves in-batch ties exactly like
    * CdcApply.runFromChangeLog.
    */
  final class Reader(spark: SparkSession, changesRoot: String,
                     changesSchema: StructType, targetRoot: String,
                     pk: Seq[String], opCol: String,
                     orderCols: DataFrame => Seq[org.apache.spark.sql.Column],
                     val coordinator: LeaseCoordinator) {

    private def shardDir(shard: String) =
      new org.apache.hadoop.fs.Path(changesRoot, shard)

    /** Data files of one shard past `after`, name-sorted — the
      * sequence-number resume rule shared with ChangeLogSource.
      */
    private def newFiles(shard: String, after: Option[String]): Seq[org.apache.hadoop.fs.Path] = {
      val d = shardDir(shard)
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).filter(_.isFile).map(_.getPath)
        .filterNot(p => p.getName.startsWith(".") || p.getName.startsWith("_"))
        .filter(p => after.forall(p.getName > _))
        .sortBy(_.getName).toSeq
    }

    /** One lease + apply cycle:
      *
      *  1. renew every held lease (a lost CAS drops the shard NOW —
      *     processing it further would double-read against the thief)
      *  2. run one taker cycle (free/expired/steal-one, per KCL)
      *  3. for each owned shard: batch-read the files past its
      *     checkpoint, merge them into the shard's target, then CAS the
      *     checkpoint forward. Crash or steal between merge and
      *     checkpoint replays those files — at-least-once, and the
      *     idempotent merge absorbs the replay.
      *
      * Returns records applied per shard this cycle (only shards that
      * had new files appear).
      */
    def pollOnce(): Map[String, Long] = {
      coordinator.renewAll()
      coordinator.takeLeases()
      val applied = scala.collection.mutable.Map.empty[String, Long]
      coordinator.owned.toSeq.sorted.foreach { shard =>
        val ckpt = coordinator.lastCheckpoint(shard)
        val files = newFiles(shard, ckpt)
        if (files.nonEmpty) {
          // same corrupt-record discipline as runFromChangeLog: FAILFAST
          // for malformed JSON, raise_error for well-formed non-objects
          val batch = spark.read.textFile(files.map(_.toString): _*)
            .select(from_json(col("value"), changesSchema,
              Map("mode" -> "FAILFAST")).as("r"), col("value"))
            .select(when(col("r").isNull, raise_error(concat(
                lit("corrupt change-log record: "), coalesce(col("value"), lit("<null>")))))
              .otherwise(col("r")).as("r"))
            .select(col("r.*"))
          val obs = Observation()
          CdcApply.mergeBatchIntoParquet(
            batch.observe(obs, count(lit(1)).as("rows")),
            new org.apache.hadoop.fs.Path(targetRoot, shard).toString,
            changesSchema, pk, opCol, orderCols)
          applied(shard) = obs.get("rows").asInstanceOf[Long]
          // a refused CAS means the shard was stolen mid-merge; the
          // thief will replay these files from the OLD checkpoint —
          // at-least-once, idempotent, and we hold the shard no longer
          coordinator.checkpoint(shard, files.last.getName)
        }
      }
      applied.toMap
    }

    /** Graceful shutdown: hand every lease back so peers take the
      * shards immediately instead of waiting out the failover window.
      */
    def close(): Unit = coordinator.releaseAll()
  }

  /** The fleet's current table state: every shard target unioned (keys
    * are shard-disjoint, so this is a plain union, no dedup needed).
    */
  def snapshot(spark: SparkSession, targetRoot: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(targetRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val dirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filterNot(d => d.getName.startsWith(".") || d.getName.startsWith("_") ||
        d.getName.endsWith("__tmp") || d.getName.endsWith("__old"))
      .sortBy(_.getName)
    val frames = dirs.toSeq.map(d => spark.read.parquet(d.toString))
    frames.reduceOption(_.unionByName(_))
  }
}
