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
  /** Guards snapshot+write so concurrent dumpers (scheduler, caller,
    * signal handler) cannot interleave; a ReentrantLock (not
    * `synchronized`) so the signal path can BOUND its wait — see
    * [[tryDump]].
    */
  private val lock = new java.util.concurrent.locks.ReentrantLock()
  private val signalDumpInProgress = new java.util.concurrent.atomic.AtomicBoolean(false)
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
    * its final progress. For the reference's out-of-band
    * signal-triggered dump (SavepointsManager.scala:248-322), also call
    * [[installSignalHandlers]].
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

  /** Install signal handlers that dump the current savepoint
    * out-of-band — the reference's SIGINT/TERM/USR2 contract
    * (SavepointsManager.scala:248-322). The handler:
    *
    *  - takes a CAS gate first: a second signal landing while a
    *    signal-triggered dump is in flight never starts a redundant
    *    dump (and, with `exitAfterDump`, forces exit immediately —
    *    orchestrators deliver one SIGTERM before promoting to SIGKILL,
    *    so the second signal must not wait)
    *  - bounds the lock wait ([[tryDump]]): a wedged scheduled dump
    *    (disk stall, slow object store) cannot stall a graceful
    *    shutdown past `lockTimeoutMillis`
    *  - with `exitAfterDump` (the TERM/INT deployment shape) exits 0
    *    whether or not the dump succeeded — first signal always exits
    *
    * Defaults install USR2 only, without exiting (the dump-progress
    * probe shape, also what the spec exercises — raising TERM in a
    * test JVM would kill the suite). Production runs install
    * `Seq("USR2", "TERM", "INT")` with `exitAfterDump = true`.
    * Previous handlers are restored on [[close]].
    */
  def installSignalHandlers(signals: Seq[String] = Seq("USR2"),
                            exitAfterDump: Boolean = false,
                            lockTimeoutMillis: Long = 10000L): this.type = {
    signals.foreach { name =>
      val sig = new sun.misc.Signal(name)
      val old = sun.misc.Signal.handle(sig, (s: sun.misc.Signal) => {
        if (!signalDumpInProgress.compareAndSet(false, true)) {
          System.err.println(
            s"[savepoints] $s received while a signal-triggered dump is in flight" +
              (if (exitAfterDump) "; forcing exit" else "; ignored"))
          if (exitAfterDump) sys.exit(0)
        } else {
          try {
            if (tryDump(lockTimeoutMillis, s.toString).isEmpty)
              System.err.println(
                s"[savepoints] no savepoint written for $s: dump lock contended " +
                  s"beyond $lockTimeoutMillis ms")
          } catch {
            case e: Exception =>
              System.err.println(s"[savepoints] signal-triggered dump for $s failed: $e")
          } finally {
            // on the exit path the flag stays set: resetting it would
            // open a re-entry window for a third signal during halt
            if (exitAfterDump) sys.exit(0) else signalDumpInProgress.set(false)
          }
        }
      })
      installedHandlers = (sig, old) :: installedHandlers
    }
    this
  }

  private var installedHandlers: List[(sun.misc.Signal, sun.misc.SignalHandler)] = Nil

  /** [[dump]] with a bounded lock wait: returns None (no savepoint)
    * if another dump holds the lock past `timeoutMillis` or the wait is
    * interrupted. The signal path uses this so a wedged scheduled dump
    * cannot stall shutdown indefinitely.
    */
  def tryDump(timeoutMillis: Long, reason: String = "on-demand"): Option[Path] = {
    val acquired =
      try lock.tryLock(timeoutMillis, TimeUnit.MILLISECONDS)
      catch { case _: InterruptedException => Thread.currentThread().interrupt(); false }
    if (!acquired) None
    else try Some(writeLocked()) finally lock.unlock()
  }

  /** Write one savepoint (tmp + rename); returns its path. Filenames are
    * monotonic, so the rename target never pre-exists and a false return
    * from `FileSystem.rename` means a real failure, not a lost race.
    */
  def dump(): Path = {
    lock.lock()
    try writeLocked() finally lock.unlock()
  }

  private def writeLocked(): Path = {
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
      installedHandlers.foreach { case (sig, old) =>
        try { sun.misc.Signal.handle(sig, old); () }
        catch { case _: Exception => () }
      }
      installedHandlers = Nil
      dump() // final savepoint
      ()
    }
  }
}

object SavepointsManager {
  /** The newest savepoint's line set under `dir` (empty when none
    * exists) — the RESUME entry point: a killed run's completed-file
    * list, readable without constructing a live manager (whose
    * `close()` writes a fresh savepoint — exactly what a read-only
    * loader must never do). Same naming convention as the writer:
    * zero-padded `savepoint_NNN.txt`, lexicographic max is newest.
    */
  def loadLatest(dir: String, hadoopConf: Configuration = new Configuration(),
                 prefix: String = "savepoint_"): Set[String] = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(hadoopConf)
    if (!fs.exists(dirPath)) return Set.empty
    val names = fs.listStatus(dirPath).filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.startsWith(prefix) && n.endsWith(".txt"))
    if (names.isEmpty) return Set.empty
    val in = fs.open(new Path(dirPath, names.max))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n != -1) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString(StandardCharsets.UTF_8.name())
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSet
    } finally in.close()
  }
}
