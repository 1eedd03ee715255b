package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The id sidecar behind batch-proportional epoch appends: epoch
  * publish/retire symmetry, membership correctness through both the
  * pruned and the fallback path, forget, and compaction invariance.
  */
class IdCensusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def root(): String =
    Files.createTempDirectory("idcensus").resolve("store").toString

  private def ids(r: String): Set[Long] =
    IdCensus.readAll(spark, r).select("id").as[Long].collect().toSet

  test("create + epoch appends accumulate; retire restores exactly") {
    val r = root()
    IdCensus.create(spark, r, spark.range(10).toDF("id"))
    assert(ids(r) === (0L until 10L).toSet)
    IdCensus.appendEpoch(spark, r, spark.range(10, 15).toDF("id"), "e1")
    assert(ids(r) === (0L until 15L).toSet)
    // re-publishing the same tag replaces, never doubles
    IdCensus.appendEpoch(spark, r, spark.range(10, 15).toDF("id"), "e1")
    assert(ids(r) === (0L until 15L).toSet)
    IdCensus.retireEpoch(spark, r, "e1")
    assert(ids(r) === (0L until 10L).toSet)
  }

  test("known returns exactly the census rows the probe hits, both paths") {
    val r = root()
    IdCensus.create(spark, r, spark.range(100).toDF("id"))
    IdCensus.appendEpoch(spark, r, spark.range(100, 120).toDF("id"), "e1")
    val probe = Seq(5L, 99L, 110L, 500L).toDF("key")
    val pruned = IdCensus.known(spark, r, probe, "key")
      .select("id").as[Long].collect().toSet
    val fallback = IdCensus.known(spark, r, probe, "key", maxInline = 1)
      .select("id").as[Long].collect().toSet
    assert(pruned === Set(5L, 99L, 110L))
    assert(fallback === pruned)
  }

  test("payload columns ride along and survive compaction") {
    val r = root()
    IdCensus.create(spark, r, Seq((1L, 10L), (2L, 20L)).toDF("id", "dl"))
    IdCensus.appendEpoch(spark, r, Seq((3L, 30L)).toDF("id", "dl"), "e1")
    IdCensus.appendEpoch(spark, r, Seq((4L, 40L)).toDF("id", "dl"), "e2")
    val before = IdCensus.readAll(spark, r).as[(Long, Long)].collect().sorted.toSeq
    IdCensus.compact(spark, r)
    val after = IdCensus.readAll(spark, r).as[(Long, Long)].collect().sorted.toSeq
    assert(before === after && after === Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // compaction folded the epoch files but membership is unchanged
    assert(IdCensus.known(spark, r, Seq(3L).toDF("k"), "k").count() === 1L)
  }

  test("forget removes ids; the stats artifact stays advisory-correct") {
    val r = root()
    IdCensus.create(spark, r, spark.range(50).toDF("id"))
    IdCensus.forget(spark, r, Seq(7L, 8L))
    assert(ids(r) === (0L until 50L).toSet -- Set(7L, 8L))
    assert(IdCensus.known(spark, r, Seq(7L, 9L).toDF("k"), "k")
      .select("id").as[Long].collect().toSet === Set(9L))
  }

  test("ensureFrom only derives when absent") {
    val r = root()
    var evaluated = 0
    def derive = { evaluated += 1; spark.range(5).toDF("id") }
    IdCensus.ensureFrom(spark, r, derive)
    IdCensus.ensureFrom(spark, r, derive)
    assert(evaluated === 1 && ids(r) === (0L until 5L).toSet)
  }
}
