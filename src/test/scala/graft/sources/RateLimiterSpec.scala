package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class RateLimiterSpec extends AnyFunSuite {

  test("sustained rate converges to the configured budget") {
    val rl = new RateLimiter(unitsPerSecond = 2000, burstSeconds = 0.05)
    val t0 = System.nanoTime()
    (1 to 600).foreach(_ => rl.acquire(1))
    val elapsed = (System.nanoTime() - t0) / 1e9
    // 600 units at 2000/s with a 100-unit burst: >= ~0.25s
    assert(elapsed >= 0.2, s"too fast: $elapsed")
    assert(elapsed < 2.0, s"too slow: $elapsed")
  }

  test("burst capacity is served without sleeping") {
    val rl = new RateLimiter(unitsPerSecond = 10, burstSeconds = 1.0)
    val t0 = System.nanoTime()
    rl.acquire(10) // full burst
    assert((System.nanoTime() - t0) / 1e9 < 0.05)
  }

  test("per-partition split divides the table budget with bounded utilization") {
    val rl = RateLimiter.perPartition(1000, parallelism = 10, utilizationPercent = 0.5)
    assert(math.abs(rl.available - 50.0) < 1.0) // 1000*0.5/10 burst
    assertThrows[IllegalArgumentException] {
      RateLimiter.perPartition(1000, 10, utilizationPercent = 2.0)
    }
    assertThrows[IllegalArgumentException](new RateLimiter(0))
  }

  test("limiter survives serialization (task closure shipping)") {
    val rl = new RateLimiter(100)
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(rl); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray)).readObject().asInstanceOf[RateLimiter]
    back.acquire(1) // transient state re-initializes, no NPE
    assert(back.available >= 0)
  }
}
