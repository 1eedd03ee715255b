package graft.sources

import org.apache.spark.sql.SparkSession

/** Run actions over CONTRACT-BOUNDED frames without AQE's per-stage
  * job fan-out (guide §1 — a job is a fixed scheduling quantum): under
  * AQE every exchange/broadcast materializes as its own Spark job
  * (measured ~70-80 ms of pure scheduling each on this class of
  * driver), which is the right trade for warehouse-scale shuffles and
  * pure overhead for a frontier round whose inputs are inline-key
  * bounded point reads. Inside `run`, adaptive execution is off and
  * broadcast joins are disabled (a broadcast exchange is its own job
  * too; a sort-merge join of bounded rows is trivially cheap), so one
  * action = ONE job regardless of its exchange count.
  *
  * Refcounted like [[KeyedReads]]' read-conf raise: concurrent bounded
  * loops (Par-fanned per-trust-set rounds) must not restore the confs
  * while a sibling is still planning under them. Callers gate entry on
  * the SAME boundedness evidence that admits inline keys — the scale
  * fallback (frame-path maintenance) never comes through here.
  */
object BoundedExec {
  private val confKeys = Seq(
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    // a bounded round's `limit(cap).collect` must be ONE job — the
    // executeTake ramp (1 → 4 → 16 → … partitions) is pure scheduling
    // cost when the inputs are bounded point reads
    "spark.sql.limit.initialNumPartitions" -> Int.MaxValue.toString,
    // ONE shuffle partition: without AQE's coalescing, every exchange
    // would run at the session's full shuffle width — 32 near-empty
    // tasks per stage for cap-bounded rows (measured: the 85→36-job
    // cut on q_pagerank_incr arrived with 100→1117 tasks and a SLOWER
    // wall until this pin). Bounded frames fit one partition by the
    // same evidence that admitted them here.
    "spark.sql.shuffle.partitions" -> "1")
  private val users = new java.util.concurrent.atomic.AtomicInteger
  @volatile private var saved: Seq[(String, Option[String])] = Nil

  def run[A](spark: SparkSession)(body: => A): A = {
    users.synchronized {
      if (users.getAndIncrement() == 0) {
        saved = confKeys.map { case (k, v) =>
          val prev = spark.conf.getOption(k)
          spark.conf.set(k, v)
          k -> prev
        }
      }
    }
    try body
    finally users.synchronized {
      if (users.decrementAndGet() == 0) {
        saved.foreach { case (k, prev) =>
          prev match {
            case Some(v) => spark.conf.set(k, v)
            case None => spark.conf.unset(k)
          }
        }
        saved = Nil
      }
    }
  }
}
