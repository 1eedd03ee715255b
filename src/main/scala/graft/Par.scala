package graft

import org.apache.spark.sql.SparkSession

/** Driver-side fan-out of INDEPENDENT Spark actions (guide §1: each
  * action is a job, and a sequential chain of small jobs pays the
  * per-job scheduling constant once per link — running independent
  * links concurrently overlaps their planning and task dispatch, the
  * dominant cost of point-lookup-sized maintenance jobs).
  *
  * Results are identical by construction: the thunks must not depend
  * on each other (the callers' contract), and Spark's scheduler runs
  * concurrent jobs safely — FIFO scheduling still overlaps jobs when
  * task slots are free, which maintenance-sized jobs always leave.
  * Exceptions propagate: the first failing thunk's error is rethrown
  * after all futures settle (no orphaned in-flight writes).
  */
object Par {

  def run[T](spark: SparkSession)(thunks: (() => T)*): Seq[T] = {
    if (thunks.lengthCompare(1) <= 0) return thunks.map(_()).toSeq
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = thunks.map { t =>
      Future {
        // Spark's active session is thread-local — pin it so thunks
        // that build frames from the session (read.parquet) resolve
        SparkSession.setActiveSession(spark)
        t()
      }
    }
    // settle ALL futures before rethrowing, so a failure never leaves
    // a sibling write racing the caller's cleanup
    val settled = futs.map(f => Await.ready(f, Duration.Inf).value.get)
    settled.map(_.get).toSeq
  }
}
