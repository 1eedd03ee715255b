package graft.savepoints

import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Resumable-progress savepoints (reference:
  * SavepointsManager.scala:53-472, PathIO.scala): periodically serialize
  * "what has already been processed" so a crashed run restarts with a
  * skip-set instead of from zero.
  *
  * All IO goes through the Hadoop `FileSystem` API resolved from the
  * directory's scheme, so the savepoint directory may live on the local
  * disk (`/path` or `file:/path`), HDFS, or an object store
  * (`s3a://…`, `gs://…`) — whatever filesystems the Spark runtime has
  * connectors for. This mirrors the reference, which routes savepoint and
  * config IO through Hadoop for non-local schemes
  * (config/MigratorConfig.scala:155-172).
  *
  * Contract preserved from the reference:
  *  - monotonic zero-padded filenames, seeded from whatever already
  *    exists in the directory (resume after restart keeps counting up)
  *  - write is tmp file + rename. On HDFS and local disk the rename is
  *    atomic; on S3A/GCS it degrades to copy+delete, which still never
  *    exposes a torn file under the final name — readers see the old
  *    savepoint or the new one, and filenames are never reused
  *  - scheduled periodic dumps on a daemon thread + on-demand dump
  *  - close() stops the scheduler and writes a final savepoint
  *
  * The serialized payload is produced by `render` (the caller decides the
  * format — the reference writes its YAML config with skip-sets merged
  * in; tests use a simple line format).
  */
final class SavepointsManager(
    dir: String,
    render: () => String,
    intervalSeconds: Long = 300L,
    prefix: String = "savepoint_",
    hadoopConf: Configuration = new Configuration()) extends AutoCloseable {

  private val dirPath = new Path(dir)

  /** The scheme's FileSystem from the process-wide Hadoop cache. Never
    * closed here: the cache is shared with Spark's own IO, and closing a
    * cached instance breaks every other user of the same scheme.
    */
  private val fs: FileSystem = dirPath.getFileSystem(hadoopConf)
  fs.mkdirs(dirPath)

  private val counter = new java.util.concurrent.atomic.AtomicLong(initialCounter())
  private val lock = new Object
  @volatile private var closed = false

  private def listNames(): Seq[String] =
    fs.listStatus(dirPath).iterator.map(_.getPath.getName).toSeq

  private def initialCounter(): Long = {
    val existing = listNames()
      .filter(n => n.startsWith(prefix) && n.endsWith(".txt"))
      .flatMap(_.stripPrefix(prefix).stripSuffix(".txt").toLongOption)
    if (existing.isEmpty) 0L else existing.max + 1
  }

  private var scheduler: Option[ScheduledExecutorService] = None
  private var shutdownHook: Option[Thread] = None

  /** Start periodic dumps on a daemon thread, and register a JVM
    * shutdown hook so an interrupted run (SIGINT/SIGTERM) still records
    * its final progress — the portable equivalent of the reference's
    * signal handlers (SavepointsManager.scala:248-322).
    */
  def start(): this.type = {
    val s = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-savepoints")
      t.setDaemon(true)
      t
    }
    // a throwing task silently cancels ALL future scheduled executions
    // (ScheduledExecutorService contract) — one transient IO failure
    // must not end savepointing for the rest of a 10-hour run
    s.scheduleAtFixedRate(() =>
      try { dump(); () }
      catch { case e: Exception =>
        System.err.println(s"[savepoints] periodic dump failed (will retry): $e")
      }, intervalSeconds, intervalSeconds, TimeUnit.SECONDS)
    scheduler = Some(s)
    val hook = new Thread(() => if (!closed) dump(), "graft-savepoints-shutdown")
    Runtime.getRuntime.addShutdownHook(hook)
    shutdownHook = Some(hook)
    this
  }

  /** Write one savepoint (tmp + rename); returns its path. Filenames are
    * monotonic, so the rename target never pre-exists and a false return
    * from `FileSystem.rename` means a real failure, not a lost race.
    */
  def dump(): Path = lock.synchronized {
    val n = counter.getAndIncrement()
    val name = f"$prefix$n%09d.txt"
    val tmp = new Path(dirPath, name + ".tmp")
    var renamed = false
    try {
      val out = fs.create(tmp, true)
      try out.write(render().getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val dst = new Path(dirPath, name)
      renamed = fs.rename(tmp, dst)
      if (!renamed)
        throw new java.io.IOException(s"failed to rename $tmp to $dst")
      dst
    } finally if (!renamed) {
      try { fs.delete(tmp, false); () }
      catch { case _: Exception => () } // best-effort tmp cleanup
    }
  }

  def latest(): Option[Path] = {
    val names = listNames()
      .filter(n => n.startsWith(prefix) && n.endsWith(".txt"))
    // zero-padded fixed-width numbering ⇒ lexicographic max is newest
    if (names.isEmpty) None else Some(new Path(dirPath, names.max))
  }

  /** Read a savepoint back through the same filesystem abstraction. */
  def readUtf8(p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n != -1) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString(StandardCharsets.UTF_8.name())
    } finally in.close()
  }

  override def close(): Unit = {
    if (!closed) {
      closed = true
      scheduler.foreach { s =>
        s.shutdown()
        s.awaitTermination(10, TimeUnit.SECONDS)
      }
      shutdownHook.foreach { h =>
        try Runtime.getRuntime.removeShutdownHook(h)
        catch { case _: IllegalStateException => () } // already shutting down
      }
      dump() // final savepoint
      ()
    }
  }
}
