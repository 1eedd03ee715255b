package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SequencesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("islands collapses distinct keys into maximal consecutive runs") {
    val keys = Seq(1L, 2L, 3L, 7L, 9L, 10L, 2L /* dup */).toDF("k")
    val got = Sequences.islands(keys, "k")
      .orderBy("island_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 3L), (7L, 7L, 1L), (9L, 10L, 2L)))
  }

  test("a single key and a fully contiguous range are one island each") {
    val single = Sequences.islands(Seq(42L).toDF("k"), "k").collect()
    assert(single.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((42L, 42L, 1L)))
    val contiguous = Sequences.islands((100L to 110L).toDF("k"), "k").collect()
    assert(contiguous.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((100L, 110L, 11L)))
  }

  test("negative keys and a gap of exactly one") {
    val got = Sequences.islands(Seq(-3L, -2L, 0L, 1L).toDF("k"), "k")
      .orderBy("island_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((-3L, -2L, 2L), (0L, 1L, 2L)))
  }
}
