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
