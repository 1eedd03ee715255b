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

  /** Result of a driver-side small-parquet read ([[localRows]]). */
  sealed trait LocalRead
  object LocalRead {
    /** Decoded rows, one per record, columns in request order. */
    final case class Rows(rows: Array[org.apache.spark.sql.Row]) extends LocalRead
    /** The files exist but lack one of the requested columns. */
    case object ColumnsMissing extends LocalRead
    /** Unsupported type / IO trouble — caller should fall back to a
      * Spark read.
      */
    case object Unsupported extends LocalRead
  }

  /** Decode a SMALL parquet directory's rows on the DRIVER — zero Spark
    * jobs, where even a cached-schema `read.parquet(...).collect()`
    * pays a collect job (and an inference job without the schema). For
    * driver-resident metadata artifacts (the `_stats` index: one row
    * per data file) the artifact is driver-sized by construction — the
    * same scaling argument as any FileIndex — so a local decode is
    * strictly cheaper than a cluster round trip at any admissible size.
    *
    * Only flat primitive columns decode: INT64/INT32/DOUBLE/FLOAT/
    * BOOLEAN with no logical annotation, and UTF8-annotated BINARY as
    * String — exactly the shapes the stats artifact writes for the
    * orderable key types. Anything else (decimal, timestamp, nested)
    * returns [[LocalRead.Unsupported]] so the caller keeps Spark's
    * decoding semantics.
    */
  def localRows(conf: Configuration, dir: String,
                columns: Seq[String]): LocalRead = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    try {
      val files = listParquetFiles(dir, conf)
      if (files.isEmpty) return LocalRead.Rows(Array.empty)
      val out = Array.newBuilder[org.apache.spark.sql.Row]
      var missing = false
      files.foreach { f =>
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
            new Path(f))
          .withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null && !missing) {
            val schema = g.getType
            val vals = columns.map { c =>
              if (!schema.containsField(c)) { missing = true; null }
              else {
                val idx = schema.getFieldIndex(c)
                val ft = schema.getType(idx)
                if (!ft.isPrimitive)
                  throw new UnsupportedOperationException(s"nested $c")
                if (g.getFieldRepetitionCount(idx) == 0) null
                else {
                  val pt = ft.asPrimitiveType()
                  val ann = pt.getLogicalTypeAnnotation
                  def intAnn(width: Int) = ann match {
                    case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                      i.isSigned && i.getBitWidth == width
                    case _ => false
                  }
                  pt.getPrimitiveTypeName match {
                    case INT64 if ann == null || intAnn(64) => g.getLong(idx, 0)
                    case INT32 if ann == null || intAnn(32) => g.getInteger(idx, 0)
                    case DOUBLE if ann == null => g.getDouble(idx, 0)
                    case FLOAT if ann == null => g.getFloat(idx, 0)
                    case BOOLEAN if ann == null => g.getBoolean(idx, 0)
                    case BINARY if ann != null &&
                        ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                      g.getString(idx, 0)
                    case other =>
                      throw new UnsupportedOperationException(s"$c: $other/$ann")
                  }
                }
              }
            }
            if (!missing) out += org.apache.spark.sql.Row(vals: _*)
            g = reader.read()
          }
        } finally reader.close()
        if (missing) return LocalRead.ColumnsMissing
      }
      LocalRead.Rows(out.result())
    } catch {
      case scala.util.control.NonFatal(_) => LocalRead.Unsupported
    }
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
