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
    assert(p1.getFileName.toString == "savepoint_000000000.txt")
    state += "seg2"
    val p2 = mgr.dump()
    assert(p2.getFileName.toString == "savepoint_000000001.txt")
    assert(Files.readString(p2) == "seg1\nseg2")
    assert(mgr.latest().contains(p2))
    mgr.close() // writes a final savepoint
    // a new manager in the same dir continues the numbering
    val mgr2 = new SavepointsManager(dir, () => "resumed")
    val p4 = mgr2.dump()
    assert(p4.getFileName.toString == "savepoint_000000003.txt")
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
