package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared auto-compact cadence for the persisted LSM stores
  * (LinkGraph, LexIndex, AnnIndex, NearDupStore) — the
  * savepoint-housekeeping discipline (reference:
  * migrator/src/main/scala/com/scylladb/migrator/SavepointsManager.scala:337-387,
  * automatic scheduled upkeep) applied to override-file growth: every
  * epoch/advance appends a few files per table, and with a manual-only
  * `compact` CLI the serve-read planning cost grows with EPOCH COUNT,
  * not data, until an operator remembers to fold. Policy: a store
  * self-compacts at the SETTLED end of a mutation when any table dir
  * holds more parquet files than the threshold.
  *
  * Threshold: `<root>/_policy.json` (`{"autoCompactFiles":N}`; 0
  * disables), default [[DefaultMaxFiles]] when absent — weeks of
  * daily single-file epochs before a fold, never a fold per append.
  *
  * Crash discipline: the fold runs under an intent marker
  * (`<root>/_compacting.json`), and every mutation entry point calls
  * [[recover]] BEFORE retiring anything. The hazard the marker
  * closes: a fold destroys per-tag file names table by table, so a
  * crash mid-fold leaves some tables folded and some not — a replayed
  * tag would then retire a COMPLETED epoch's rows from the unfolded
  * tables while the folded ones keep theirs. Completing the fold
  * first restores the invariant (all names gone, all rows present),
  * and the stores' delta checks (edge anti-join, id census) then make
  * the replay a clean no-op. This requires the fold itself to be
  * ALL-OR-NOTHING per table (SwapStore full-rewrite folds, as every
  * store's `compact`/`recluster` here is) — a partial small-file
  * merge would leave a tag's names half-destroyed WITHIN one table,
  * which no entry-point recovery can repair.
  */
object AutoCompact {

  /** Default per-table-dir parquet-file threshold. */
  val DefaultMaxFiles = 64

  private def policyPath(root: String) = root + "/_policy.json"
  private def markerPath(root: String) = root + "/_compacting.json"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeSmall(spark: SparkSession, path: String, body: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.mkdirs(dst.getParent) || fs.exists(dst.getParent),
      s"cannot create ${dst.getParent}")
    val tmp = new org.apache.hadoop.fs.Path(dst.getParent, s".tmp-${dst.getName}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"atomic write failed for $path")
  }

  /** Pin the store's threshold (`maxFiles` parquet files in any table
    * dir triggers a fold at the next settled mutation; 0 disables).
    */
  def setPolicy(spark: SparkSession, root: String, maxFiles: Int): Unit = {
    require(maxFiles >= 0, "maxFiles must be >= 0 (0 disables)")
    writeSmall(spark, policyPath(root), s"""{"autoCompactFiles":$maxFiles}""")
  }

  def threshold(spark: SparkSession, root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(policyPath(root))
    val fs = fsOf(spark, root)
    if (!fs.exists(p)) return DefaultMaxFiles
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val pat = """\{"autoCompactFiles":(\d+)\}""".r
    body.trim match {
      case pat(n) => n.toInt
      case other => throw new IllegalStateException(
        s"malformed ${policyPath(root)}: $other")
    }
  }

  /** Fold now iff any of `dirs` exceeds the policy threshold, under
    * the intent marker. Returns whether the fold ran.
    */
  def maybe(spark: SparkSession, root: String, dirs: Seq[String])
           (fold: => Unit): Boolean = {
    val thr = threshold(spark, root)
    if (thr <= 0) return false
    val conf = spark.sparkContext.hadoopConfiguration
    val over = dirs.exists(d =>
      ParquetSource.listParquetFiles(d, conf).size > thr)
    if (!over) return false
    writeSmall(spark, markerPath(root), """{"compacting":1}""")
    fold
    fsOf(spark, root).delete(new org.apache.hadoop.fs.Path(markerPath(root)), false)
    true
  }

  /** Complete an interrupted fold (idempotent — a fold re-folds
    * whatever each table currently holds), clearing the marker. Call
    * at every mutation entry point BEFORE retiring anything.
    */
  def recover(spark: SparkSession, root: String)(fold: => Unit): Unit = {
    val m = new org.apache.hadoop.fs.Path(markerPath(root))
    val fs = fsOf(spark, root)
    if (fs.exists(m)) {
      fold
      fs.delete(m, false)
      ()
    }
  }
}
