package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** Small-file compaction (the OPTIMIZE maintenance op): streaming
  * sinks and per-batch appends (CdcApply targets, SketchMaintenance
  * stores, savepointed batch copies) accrete files far below the scan
  * sweet spot; at 100 TB a million 1 MB files turns every scan into a
  * listing + open storm. Compaction bin-packs the SMALL files into
  * target-sized replacements and leaves the already-right-sized files
  * untouched — the rewrite cost is proportional to the small-file
  * bytes, never the table.
  *
  * Crash safety without a table format: a write-ahead marker per group
  * (`_compaction/<group>.json` lists originals + replacement) commits
  * the swap. Order of operations: write replacement to a staging path
  * → write marker → move replacement in → delete originals → delete
  * marker. A crash anywhere leaves either (a) no marker — staging
  * debris only, data intact; or (b) a marker — [[recover]] (run
  * automatically at the start of every [[compact]]) completes the
  * deletion iff the replacement is fully in place, else rolls the
  * group back. Data is never lost; the only transient anomaly is
  * duplicate rows between move-in and original-deletion, so run
  * without concurrent READERS (concurrent writers are out of contract,
  * as for any in-place maintenance op).
  *
  * Row-count verified: each group's replacement is re-read and counted
  * against the originals before anything is deleted.
  */
object Compaction {

  final case class Plan(groups: Seq[Seq[String]], untouched: Seq[String])
  final case class Result(groupsCompacted: Int, filesRemoved: Int,
                          filesCreated: Int, rowsMoved: Long)

  /** Bin-pack files smaller than `smallBytes` into groups of at most
    * `targetBytes`, in NAME order (sorted layouts keep their
    * clustering: adjacent files merge with adjacent key ranges).
    * Single-file groups stay untouched — nothing to gain.
    */
  def plan(spark: SparkSession, dir: String, targetBytes: Long,
           smallBytes: Long): Plan = {
    require(targetBytes > 0 && smallBytes > 0 && smallBytes <= targetBytes)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val sized = ParquetSource.listParquetFiles(dir, conf)
      .map(f => f -> fs.getFileStatus(new Path(f)).getLen)
    val (small, big) = sized.partition(_._2 < smallBytes)
    val groups = scala.collection.mutable.ListBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ListBuffer[String]()
    var curBytes = 0L
    small.foreach { case (f, len) =>
      if (cur.nonEmpty && curBytes + len > targetBytes) {
        groups += cur.toSeq; cur = scala.collection.mutable.ListBuffer[String]()
        curBytes = 0L
      }
      cur += f; curBytes += len
    }
    if (cur.nonEmpty) groups += cur.toSeq
    val (real, lone) = groups.toSeq.partition(_.size >= 2)
    Plan(real, big.map(_._1) ++ lone.flatten)
  }

  /** Complete or roll back any interrupted group swaps (see object
    * doc). Returns the number of markers resolved.
    */
  def recover(spark: SparkSession, dir: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val markers = new Path(dir, "_compaction")
    val fs = markers.getFileSystem(conf)
    if (!fs.exists(markers)) return 0
    val resolved = fs.listStatus(markers).filter(_.isFile).map { st =>
      val body = new String(readAll(fs, st.getPath), "UTF-8")
      val lines = body.split("\n").filter(_.nonEmpty)
      // line 0: replacement path; rest: originals. A zero-byte or
      // partially-flushed marker (< 2 lines) means the move never
      // started (it strictly follows the marker close): originals are
      // authoritative — drop the debris instead of crashing recovery
      if (lines.length >= 2) {
        val replacement = new Path(lines.head)
        if (fs.exists(replacement))
          lines.tail.foreach(o => fs.delete(new Path(o), false))
        // replacement missing: the move never happened — originals are
        // the only copy, keep them (staging debris is harmless)
      }
      fs.delete(st.getPath, false)
      1
    }.sum
    if (fs.listStatus(markers).isEmpty) fs.delete(markers, true)
    resolved
  }

  private def readAll(fs: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              smallBytes: Long = 0L): Result = {
    val small = if (smallBytes > 0) smallBytes else targetBytes / 2
    recover(spark, dir)
    val p = plan(spark, dir, targetBytes, small)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    var removed = 0
    var rows = 0L
    p.groups.zipWithIndex.foreach { case (group, i) =>
      val expected = spark.read.parquet(group: _*).count()
      // one replacement file per group, staged then sworn in
      val staging = new Path(dir, s"_compact_staging_$i")
      spark.read.parquet(group: _*).coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
      val part = fs.listStatus(staging)
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet written under $staging"))
      val got = spark.read.parquet(part.toString).count()
      require(got == expected,
        s"compaction group $i row mismatch: $got != $expected — aborting, originals kept")
      val target = new Path(dir, s"part-compacted-$i-${java.util.UUID.randomUUID()}.parquet")
      // marker commits the swap
      val markers = new Path(dir, "_compaction")
      require(fs.mkdirs(markers) || fs.exists(markers),
        s"could not create marker dir $markers — aborting before the swap")
      val marker = new Path(markers, s"group_$i.json")
      val body = (target.toString +: group).mkString("\n")
      val out = fs.create(marker, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      // rename is the commit point: Hadoop FileSystems report failure by
      // returning false, and deleting the originals after a failed move
      // would destroy the only copy — abort with originals intact (the
      // next recover() drops the marker since the target never appeared)
      require(fs.rename(part, target),
        s"rename $part -> $target failed — aborting swap, originals kept")
      group.foreach(o => fs.delete(new Path(o), false))
      fs.delete(marker, false)
      fs.delete(staging, true)
      removed += group.size
      rows += expected
    }
    val markers = new Path(dir, "_compaction")
    if (fs.exists(markers) && fs.listStatus(markers).isEmpty)
      fs.delete(markers, true)
    // the swap replaced files wholesale: evict this session's listing
    // cache (never expires by default) so subsequent reads of `dir`
    // can't serve the pre-compaction file list — see SwapStore
    if (p.groups.nonEmpty) spark.catalog.refreshByPath(dir)
    Result(p.groups.size, removed, p.groups.size, rows)
  }
}
