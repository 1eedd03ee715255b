package graft.savepoints

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import scala.jdk.CollectionConverters._

/** Resumable-progress savepoints (reference:
  * SavepointsManager.scala:53-472): periodically serialize "what has
  * already been processed" so a crashed run restarts with a skip-set
  * instead of from zero.
  *
  * Contract preserved from the reference:
  *  - monotonic zero-padded filenames, seeded from whatever already
  *    exists in the directory (resume after restart keeps counting up)
  *  - atomic write: tmp file + rename
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
    prefix: String = "savepoint_") extends AutoCloseable {

  private val dirPath: Path = Paths.get(dir)
  Files.createDirectories(dirPath)

  private val counter = new java.util.concurrent.atomic.AtomicLong(initialCounter())
  private val lock = new Object
  @volatile private var closed = false

  /** Directory listing with the stream closed (Files.list holds a
    * directory handle until closed — leaking one per call would
    * exhaust fds on a long-lived driver).
    */
  private def listDir[T](f: Iterator[Path] => T): T = {
    val stream = Files.list(dirPath)
    try f(stream.iterator().asScala) finally stream.close()
  }

  private def initialCounter(): Long = listDir { it =>
    val existing = it
      .map(_.getFileName.toString)
      .filter(n => n.startsWith(prefix) && n.endsWith(".txt"))
      .map(_.stripPrefix(prefix).stripSuffix(".txt"))
      .flatMap(s => s.toLongOption)
      .toSeq
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

  /** Write one savepoint atomically (tmp + rename); returns its path. */
  def dump(): Path = lock.synchronized {
    val n = counter.getAndIncrement()
    val name = f"$prefix$n%09d.txt"
    val tmp = dirPath.resolve(name + ".tmp")
    Files.writeString(tmp, render())
    val dst = dirPath.resolve(name)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    dst
  }

  def latest(): Option[Path] = listDir { it =>
    val files = it
      .filter(p => p.getFileName.toString.startsWith(prefix)
        && p.getFileName.toString.endsWith(".txt"))
      .toSeq
    if (files.isEmpty) None else Some(files.maxBy(_.getFileName.toString))
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
