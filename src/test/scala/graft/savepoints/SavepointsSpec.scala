package graft.savepoints

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SavepointsSpec extends AnyFunSuite {

  test("savepoints are atomic, monotonic, and resume numbering across restarts") {
    val dir = Files.createTempDirectory("graft-sp").toString
    var state = Set("seg1")
    val mgr = new SavepointsManager(dir, () => state.toSeq.sorted.mkString("\n"))
    val p1 = mgr.dump()
    assert(p1.getName == "savepoint_000000000.txt")
    state += "seg2"
    val p2 = mgr.dump()
    assert(p2.getName == "savepoint_000000001.txt")
    assert(mgr.readUtf8(p2) == "seg1\nseg2")
    assert(mgr.latest().contains(p2))
    mgr.close() // writes a final savepoint
    // a new manager in the same dir continues the numbering
    val mgr2 = new SavepointsManager(dir, () => "resumed")
    val p4 = mgr2.dump()
    assert(p4.getName == "savepoint_000000003.txt")
    mgr2.close()
    // the files really landed on local disk (Hadoop local FS backs bare paths)
    assert(Files.exists(java.nio.file.Paths.get(dir, "savepoint_000000003.txt")))
  }

  test("savepoints write through Hadoop FileSystem for scheme'd URIs (file:/)") {
    // the sandbox's S3A-readiness proof: a file:// URI exercises the same
    // scheme-resolved Hadoop FileSystem code path an s3a:// dir would take
    val local = Files.createTempDirectory("graft-sp-uri")
    val uri = local.toUri.toString // file:///tmp/...
    val mgr = new SavepointsManager(uri, () => "via-hadoop",
      hadoopConf = TestSpark.spark.sparkContext.hadoopConfiguration)
    val p = mgr.dump()
    assert(p.getName == "savepoint_000000000.txt")
    assert(mgr.readUtf8(p) == "via-hadoop")
    // no torn tmp file left behind under the final name's sibling
    assert(!Files.exists(local.resolve("savepoint_000000000.txt.tmp")))
    // resume numbering also works through the URI path
    mgr.close()
    val mgr2 = new SavepointsManager(uri, () => "resumed",
      hadoopConf = TestSpark.spark.sparkContext.hadoopConfiguration)
    assert(mgr2.dump().getName == "savepoint_000000002.txt")
    mgr2.close()
  }

  test("signal-triggered dump runs concurrently with scheduled dumps, filenames stay monotonic") {
    val dir = Files.createTempDirectory("graft-sp-sig").toString
    val rendered = new java.util.concurrent.atomic.AtomicLong(0L)
    val mgr = new SavepointsManager(dir, () => s"state_${rendered.incrementAndGet()}")
    mgr.installSignalHandlers() // USR2 only, no exit — test-JVM-safe
    try {
      // hammer the lock from a "scheduler": continuous dumps on another
      // thread while signals land out-of-band
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val scheduled = new Thread(() => while (!stop.get()) { mgr.dump(); () })
      scheduled.start()
      for (_ <- 1 to 3) {
        sun.misc.Signal.raise(new sun.misc.Signal("USR2"))
        Thread.sleep(50)
      }
      stop.set(true)
      scheduled.join(5000)
      assert(!scheduled.isAlive)
      // the last raise may still be mid-dump on the signal-dispatch
      // thread — wait for the directory to go quiet before asserting
      var snapshot = new java.io.File(dir).list().toSet
      var settled = false
      val deadline = System.nanoTime() + 5000000000L
      while (!settled && System.nanoTime() < deadline) {
        Thread.sleep(250)
        val now = new java.io.File(dir).list().toSet
        settled = now == snapshot
        snapshot = now
      }
      assert(settled, "savepoint directory still changing after 5 s")
      // every file is a full snapshot (no torn writes), numbering is
      // gapless and strictly increasing despite the two writers racing
      val names = new java.io.File(dir).list().toSeq.filter(_.endsWith(".txt")).sorted
      assert(names.nonEmpty)
      val nums = names.map(_.stripPrefix("savepoint_").stripSuffix(".txt").toLong)
      assert(nums == (0L until names.size.toLong))
      names.foreach { n =>
        val content = new String(Files.readAllBytes(java.nio.file.Paths.get(dir, n)), "UTF-8")
        assert(content.matches("state_\\d+"), s"torn savepoint $n: $content")
      }
      assert(new java.io.File(dir).list().forall(!_.endsWith(".tmp")))
    } finally mgr.close()
  }

  test("signal dump's lock wait is bounded: a wedged dump cannot stall it past the timeout") {
    val dir = Files.createTempDirectory("graft-sp-wedge").toString
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    // a render that wedges (slow disk / hung object store stand-in)
    val mgr = new SavepointsManager(dir, () => { entered.countDown(); gate.await(); "late" })
    try {
      val wedged = new Thread(() => { mgr.dump(); () })
      wedged.start()
      entered.await() // the wedged dump now owns the lock
      val t0 = System.nanoTime()
      val got = mgr.tryDump(timeoutMillis = 200L, reason = "USR2")
      val waitedMs = (System.nanoTime() - t0) / 1e6
      assert(got.isEmpty, "bounded dump must give up, not wait for the wedged writer")
      assert(waitedMs >= 150 && waitedMs < 5000, s"waited $waitedMs ms")
      gate.countDown()
      wedged.join(5000)
      // once the lock frees, tryDump succeeds and numbering continued
      assert(mgr.tryDump(timeoutMillis = 200L).isDefined)
    } finally { gate.countDown(); mgr.close() }
  }

  test("accumulators merge across tasks and survive retries growing-only") {
    val spark = TestSpark.spark
    val sc = spark.sparkContext
    val strings = new StringSetAccumulator
    val ints = new IntSetAccumulator
    val ranges = new RangeSetAccumulator
    sc.register(strings, "files")
    sc.register(ints, "segments")
    sc.register(ranges, "tokenRanges")
    sc.parallelize(1 to 100, 8).foreach { i =>
      strings.add(s"file_${i % 10}")
      ints.add(i % 7)
      ranges.add((i.toLong % 3, i.toLong % 3 + 10))
    }
    assert(strings.value == (0 until 10).map(i => s"file_$i").toSet)
    assert(ints.value == (0 until 7).toSet)
    assert(ranges.value == (0L until 3L).map(i => (i, i + 10)).toSet)
  }
}
