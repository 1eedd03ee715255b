package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted id sidecar for the incremental stores ([[graft.pipeline
  * .AnnIndex]], [[graft.pipeline.LexIndex]]) — the summary table that
  * makes delta detection batch-proportional. Without it, every epoch
  * append answers "which of these ids are already indexed?" by
  * scanning the FULL index's id column plus a distinct — and the
  * streaming ingest paths pay that per micro-batch, so ingest cost
  * grows with the INDEX, not the batch (the line-census pattern from
  * [[graft.pipeline.Web]] already solved this for line hashes; this is
  * the id-set generalization).
  *
  * Layout: `<root>/_ids/rows/` — one row per indexed id (`id` first,
  * optional payload columns such as the lex index's document length),
  * id-range-clustered and carrying a [[FileStatsIndex]] `_stats`
  * artifact, so a bounded batch's membership check reads only the
  * row groups — and opens only the FILES — its sorted id chunks
  * actually touch ([[KeyedReads.prunedRead]]). Fixed batch ⇒ flat
  * read cost under any index growth.
  *
  * Consistency contract: the census is maintained by every index
  * write path under the SAME epoch tag as the index files
  * ([[EpochFiles]] deterministic names), so replaying or rolling back
  * a tag restores census and index together and the recomputed delta
  * is identical. A crash BETWEEN the index publish and the census
  * publish of one tag is repaired by replaying that tag (exactly what
  * the streaming checkpoint replay and the savepoint batch replay do)
  * — running a DIFFERENT tag past an unrepaired crash is outside the
  * protocol, same as it always was for half-published index files.
  * [[ensureFrom]] lazily (re)derives the census from the index's own
  * id column, so pre-sidecar stores migrate on first touch and
  * `Maintain … rebuildids` can force a re-derive after any
  * out-of-protocol surgery. The artifact is advisory in one direction
  * only: stats staleness can under-prune, never lose rows.
  */
object IdCensus {

  def rowsDir(root: String): String =
    new org.apache.hadoop.fs.Path(root, "_ids/rows").toString
  private def stageDir(root: String, tag: String): String =
    new org.apache.hadoop.fs.Path(root, s"_ids/_stage/$tag").toString

  def exists(spark: SparkSession, root: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(rowsDir(root))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def clustered(df: DataFrame): DataFrame =
    df.repartitionByRange(col("id")).sortWithinPartitions(col("id"))

  /** Overwrite the census with `rows` (column `id` + optional payload)
    * and build its stats artifact.
    */
  def create(spark: SparkSession, root: String, rows: DataFrame): Unit = {
    clustered(rows).write.mode("overwrite").parquet(rowsDir(root))
    FileStatsIndex.buildAndSave(spark, rowsDir(root), Seq("id"))
    spark.catalog.refreshByPath(rowsDir(root))
  }

  /** Lazy migration/repair: derive and persist the census from the
    * index's ground truth iff no census exists yet. `derive` is only
    * evaluated (and only pays its scan) on that first touch.
    */
  def ensureFrom(spark: SparkSession, root: String, derive: => DataFrame): Unit =
    if (!exists(spark, root)) create(spark, root, derive)

  /** Publish an epoch's new ids under the tag's deterministic file
    * names (the [[EpochFiles]] discipline — re-publishing a tag
    * retires its previous attempt first), then advance the stats
    * artifact over the fresh files only (batch-proportional).
    */
  def appendEpoch(spark: SparkSession, root: String, rows: DataFrame,
                  tag: String): Unit = {
    val stage = stageDir(root, tag)
    clustered(rows).write.mode("overwrite").parquet(stage)
    val published = EpochFiles.publish(spark, stage, rowsDir(root), tag)
    // stats advance over EXACTLY the published files — one small job
    // (the write-pass discipline), never an artifact diff per epoch
    FileStatsIndex.appendFor(spark, rowsDir(root), Seq("id"), published)
    ()
  }

  /** Plain (non-tagged) append for the plain index-append path: same
    * clustered layout and stats advance, no replay protocol.
    */
  def appendPlain(spark: SparkSession, root: String, rows: DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val before = ParquetSource.listParquetFiles(rowsDir(root), conf).toSet
    clustered(rows).write.mode("append").parquet(rowsDir(root))
    spark.catalog.refreshByPath(rowsDir(root))
    val fresh = ParquetSource.listParquetFiles(rowsDir(root), conf)
      .filterNot(before.contains)
    FileStatsIndex.appendFor(spark, rowsDir(root), Seq("id"), fresh)
    ()
  }

  /** Remove everything the tag published (plus staging leftovers) —
    * the census half of an epoch rollback/replay.
    */
  def retireEpoch(spark: SparkSession, root: String, tag: String): Unit = {
    EpochFiles.retire(spark, rowsDir(root), tag)
    val st = new org.apache.hadoop.fs.Path(stageDir(root, tag))
    val fs = st.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(st, true)
    ()
  }

  /** Census rows whose id appears in `probe.probeIdCol` — the
    * membership check behind delta detection. Bounded probes (≤
    * `maxInline` distinct ids) go through the two-layer pruned read
    * ([[KeyedReads]]: stats-pruned file list + pushed sorted-chunk IN
    * predicates), so cost follows the probe, not the census; larger
    * probes fall back to a semi-join against the full (still narrow)
    * census read.
    */
  def known(spark: SparkSession, root: String, probe: DataFrame,
            probeIdCol: String, maxInline: Int = 2000000): DataFrame =
    KeyedReads.collectKeys(probe, probeIdCol, maxInline) match {
      case Some(ks) => KeyedReads.prunedRead(spark, rowsDir(root), "id", ks)
      case None =>
        readAll(spark, root).join(
          probe.select(col(probeIdCol).as("id")).distinct(), Seq("id"), "left_semi")
    }

  def readAll(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(rowsDir(root))

  /** Right-to-be-forgotten half for the census: crash-safe targeted
    * rewrite of only the files holding a forgotten id, then a stats
    * refresh (drops entries for rewritten-away files, stats the new
    * ones).
    */
  def forget(spark: SparkSession, root: String, ids: Seq[Any]): Unit = {
    TargetedDelete.deleteAuto(spark, rowsDir(root), "id", ids)
    spark.catalog.refreshByPath(rowsDir(root))
    FileStatsIndex.update(spark, rowsDir(root), Seq("id"))
    ()
  }

  /** MINOR fold: merge only the accumulated per-tag OVERRIDE files
    * into id-clustered runs at the caller's granularity — I/O ∝
    * override bytes, never the census ([[TargetedDelete.foldFiles]]'s
    * roll-forward marker keeps the subset swap all-or-nothing, so
    * every folded tag loses ALL its names or none). Ids are unique
    * across tags by the delta discipline, so the resolve is identity.
    * `rowsPerFile ≤ 0` leaves file sizing to the shard count alone
    * (pre-policy stores).
    */
  def compactOverrides(spark: SparkSession, root: String,
                       rowsPerFile: Long): Unit = {
    if (!exists(spark, root)) return
    val dir = rowsDir(root)
    val conf = spark.sparkContext.hadoopConfiguration
    val tagged = ParquetSource.listParquetFiles(dir, conf)
      .filter(f => EpochFiles.isTagged(new org.apache.hadoop.fs.Path(f).getName))
    val ran = TargetedDelete.foldFiles(spark, dir, tagged, identity,
      (df, staging) => {
        val shards = math.max(1L, math.min(200L,
          if (rowsPerFile > 0) (df.count() - 1L) / rowsPerFile + 1L else 1L)).toInt
        val w = df.repartitionByRange(shards, col("id"))
          .sortWithinPartitions(col("id")).write
        (if (rowsPerFile > 0) w.option("maxRecordsPerFile", rowsPerFile) else w)
          .mode("overwrite").parquet(staging)
      })
    if (ran) {
      FileStatsIndex.update(spark, dir, Seq("id"))
      spark.catalog.refreshByPath(dir)
    }
  }

  /** Fold accumulated epoch files back into a globally id-clustered
    * layout (crash-safe swap) and rebuild the stats artifact. Same
    * between-epochs caveat as every store compact: the swap renames
    * files, destroying the per-tag names an in-flight replay would
    * retire.
    */
  def compact(spark: SparkSession, root: String): Unit = {
    if (!exists(spark, root)) return
    val cur = graft.streaming.SwapStore.readCurrent(spark, rowsDir(root),
      new org.apache.spark.sql.types.StructType())
    graft.streaming.SwapStore.swapWrite(clustered(cur), rowsDir(root))
    FileStatsIndex.buildAndSave(spark, rowsDir(root), Seq("id"))
    spark.catalog.refreshByPath(rowsDir(root))
  }
}
