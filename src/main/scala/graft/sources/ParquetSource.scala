package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet source with resumable file-level progress (reference:
  * readers/Parquet.scala:40-170 + readers/ParquetSavepointsManager).
  *
  * Design choice per SURVEY.md §7.4: instead of introspecting
  * `FileSourceScanExec.inputRDD` partitions to infer file completion from
  * a SparkListener, resume is driven explicitly — list files, subtract
  * the skip-set, process in deterministic batches, record each completed
  * batch. File completion becomes a first-class loop, no internal APIs.
  */
object ParquetSource {

  /** Recursive listing of .parquet files under a root, sorted for
    * determinism (reference: readers/Parquet.scala:148-170).
    */
  def listParquetFiles(root: String, conf: Configuration): Seq[String] = {
    val path = new Path(root)
    val fs = path.getFileSystem(conf)
    // metadata conventions shared with Spark's own FileIndex: _- and
    // .-prefixed paths (e.g. the _stats index, _SUCCESS markers,
    // .hidden temp files) are never data — explicit file lists bypass
    // Spark's hidden-path filter, so the listing must apply it itself
    def hidden(p: Path): Boolean =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    def walk(p: Path, isRoot: Boolean): Seq[String] = {
      if (!isRoot && hidden(p)) return Seq.empty
      val status = fs.getFileStatus(p)
      if (status.isDirectory)
        fs.listStatus(p).toIndexedSeq.flatMap(s => walk(s.getPath, isRoot = false))
      else if (p.getName.endsWith(".parquet")) Seq(p.toString)
      else Seq.empty
    }
    walk(path, isRoot = true).sorted
  }

  /** Read all files except the skip-set (resume semantics: a file in the
    * skip-set was fully written to the target in a previous run).
    */
  def readSkipping(spark: SparkSession, root: String, skipFiles: Set[String]): DataFrame = {
    val files = listParquetFiles(root, spark.sparkContext.hadoopConfiguration)
      .filterNot(skipFiles.contains)
    require(files.nonEmpty, s"no parquet files left to read under $root")
    spark.read.parquet(files: _*)
  }

  /** Resumable batched processing: files are processed `batchSize` at a
    * time; `process` handles one batch end-to-end (read→write); completed
    * files are reported through `onBatchDone` so the caller can persist a
    * savepoint between batches.
    */
  def processInBatches(spark: SparkSession, root: String, skipFiles: Set[String],
                       batchSize: Int, mergeSchema: Boolean = false)(
      process: DataFrame => Unit)(onBatchDone: Seq[String] => Unit): Unit = {
    val all = listParquetFiles(root, spark.sparkContext.hadoopConfiguration)
    val remaining = all.filterNot(skipFiles.contains)
    // Schema-evolved tables: union the per-file schemas ONCE across EVERY
    // listed file — including already-skipped ones (footer reads only —
    // no data scan) — then pin that schema on each batch read. Without
    // the pin, each batch would carry only its own files' columns and the
    // appended target would silently drop evolved columns batch by batch.
    // The union must cover skipped files too: on a savepoint resume where
    // an evolved column lives only in already-completed files, a
    // remaining-only union would append a NARROWER schema than the
    // pre-crash batches did, leaving the target mixed-schema (a plain
    // read of it then nondeterministically drops the evolved column).
    val pinned: Option[org.apache.spark.sql.types.StructType] =
      if (mergeSchema && all.nonEmpty)
        Some(spark.read.option("mergeSchema", "true").parquet(all: _*).schema)
      else None
    remaining.grouped(batchSize).foreach { batch =>
      val reader = pinned.fold(spark.read)(s => spark.read.schema(s))
      process(reader.parquet(batch: _*))
      onBatchDone(batch)
    }
  }
}
