package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Bench.priorQueries must parse DRIVER-format round files — the driver
  * wraps the bench's stdout JSON line under a `parsed` key (top-level
  * keys `{n, rc, cpus, sf, tail, parsed}`) — with a fallback to raw
  * bench output that carries `queries` at the top level. A regression
  * here silently kills the >30% regression-retime net (it shipped dead
  * for a round because only the top-level shape was read).
  */
class BenchPriorSpec extends AnyFunSuite {

  private def write(dir: java.nio.file.Path, name: String, body: String): Unit =
    Files.write(dir.resolve(name), body.getBytes("UTF-8"))

  // verbatim shape of a driver-written BENCH_r*.json (truncated tail)
  private val driverFormat =
    """{
      |  "n": 10,
      |  "rc": 0,
      |  "cpus": 32,
      |  "sf": 0.1,
      |  "tail": "WARN noise...\n{\"metric\":\"total\",...}",
      |  "parsed": {
      |    "metric": "total",
      |    "value": 96.242,
      |    "unit": "sec",
      |    "queries": {"q_a": 5.809, "q_b": 0.315},
      |    "retimed": {"q_a": 2.53},
      |    "calibration": {"spin": [0.136, 0.140]},
      |    "sf": 0.1
      |  }
      |}""".stripMargin

  test("reads queries nested under parsed (driver round-file format)") {
    val dir = Files.createTempDirectory("graft-bench-prior")
    write(dir, "BENCH_r09.json", driverFormat)
    val m = Bench.priorQueries(dir.toFile)
    assert(m === Map("q_a" -> 5.809, "q_b" -> 0.315))
  }

  test("falls back to top-level queries (raw bench stdout saved directly)") {
    val dir = Files.createTempDirectory("graft-bench-prior")
    write(dir, "BENCH_r03.json",
      """{"metric":"total","value":1.0,"unit":"sec","queries":{"q_x":0.5}}""")
    val m = Bench.priorQueries(dir.toFile)
    assert(m === Map("q_x" -> 0.5))
  }

  test("priorSpin reads the calibration sentinel min (nested and top-level)") {
    val dir = Files.createTempDirectory("graft-bench-spin")
    write(dir, "BENCH_r09.json",
      """{"parsed":{"queries":{"q_a":1.0},
        |"calibration":{"spin_sec":[0.150,0.130],"spark_job_sec":[0.4,0.5]}}}""".stripMargin)
    assert(Bench.priorSpin(dir.toFile).contains(0.130))
    val top = Files.createTempDirectory("graft-bench-spin2")
    write(top, "BENCH_r02.json",
      """{"queries":{"q_x":0.5},"calibration":{"spin_sec":[0.2,0.3]}}""")
    assert(Bench.priorSpin(top.toFile).contains(0.2))
    // no calibration block → no reference → the retime net stays armed
    write(top, "BENCH_r03.json", """{"queries":{"q_x":0.5}}""")
    assert(Bench.priorSpin(top.toFile).isEmpty)
  }

  test("picks the numerically-latest round and survives malformed files") {
    val dir = Files.createTempDirectory("graft-bench-prior")
    write(dir, "BENCH_r02.json",
      """{"queries":{"q_old":9.0}}""")
    write(dir, "BENCH_r10.json", driverFormat)
    assert(Bench.priorQueries(dir.toFile).contains("q_a"))
    assert(!Bench.priorQueries(dir.toFile).contains("q_old"))

    val bad = Files.createTempDirectory("graft-bench-prior")
    write(bad, "BENCH_r11.json", "not json at all")
    assert(Bench.priorQueries(bad.toFile).isEmpty)
    assert(Bench.priorQueries(Files.createTempDirectory("empty").toFile).isEmpty)
  }
}
