package graft.sources

/** Token-bucket rate limiter for throughput-capped sinks/sources
  * (reference: RCU/WCU throttling, readers/DynamoDB.scala:164-187 and
  * writers/DynamoDB.scala:100-119 — the EMR connector's read/write
  * percent knobs; SURVEY.md §4 "no Spark primitive" row).
  *
  * One limiter per executor partition (create inside
  * `foreachPartition`/`mapPartitions`); the per-partition rate is the
  * table budget divided by parallelism, mirroring how the reference
  * splits RCU/WCU across scan segments. Serializable so a configured
  * factory can ship in a task closure.
  */
final class RateLimiter(unitsPerSecond: Double, burstSeconds: Double = 1.0)
    extends Serializable {
  require(unitsPerSecond > 0, "rate must be positive")

  private val capacity: Double = unitsPerSecond * burstSeconds
  @transient private var tokens: Double = capacity
  @transient private var lastRefillNanos: Long = System.nanoTime()

  private def refill(): Unit = {
    val now = System.nanoTime()
    if (lastRefillNanos == 0L) {
      // @transient fields deserialize to 0 when the limiter ships in a
      // task closure: re-initialize to a full bucket anchored at first
      // use instead of computing elapsed from nanoTime's arbitrary origin
      tokens = capacity
      lastRefillNanos = now
      return
    }
    val elapsed = (now - lastRefillNanos) / 1e9
    tokens = math.min(capacity, tokens + elapsed * unitsPerSecond)
    lastRefillNanos = now
  }

  /** Acquire `units`, sleeping until the bucket allows it. Units may
    * exceed the burst capacity (a single big item): the call then waits
    * for the full duration and takes the bucket negative-to-zero.
    */
  def acquire(units: Double = 1.0): Unit = synchronized {
    refill()
    if (tokens >= units) { tokens -= units; return }
    val deficit = units - tokens
    val waitSeconds = deficit / unitsPerSecond
    tokens = 0
    try Thread.sleep((waitSeconds * 1000).toLong, ((waitSeconds * 1e9) % 1e6).toInt)
    catch { case _: InterruptedException => Thread.currentThread().interrupt() }
    lastRefillNanos = System.nanoTime()
  }

  /** Tokens currently available (for tests/metrics). */
  def available: Double = synchronized { refill(); tokens }
}

object RateLimiter {
  /** Split a table-level budget across `parallelism` partitions. */
  def perPartition(tableUnitsPerSecond: Double, parallelism: Int,
                   utilizationPercent: Double = 1.0): RateLimiter = {
    require(utilizationPercent >= 0.1 && utilizationPercent <= 1.5,
      "utilization must be in [0.1, 1.5]") // same bounds as the reference knobs
    new RateLimiter(tableUnitsPerSecond * utilizationPercent / math.max(parallelism, 1))
  }
}
