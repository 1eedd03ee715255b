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

  /** Ground truth: collapse a sorted distinct key set into runs on the
    * driver — the obviously-correct form the sharded plan must equal.
    */
  private def naiveIslands(keys: Seq[Long]): Seq[(Long, Long, Long)] = {
    val sorted = keys.distinct.sorted
    if (sorted.isEmpty) Seq.empty
    else sorted.tail.foldLeft(Vector((sorted.head, sorted.head))) {
      case (acc, k) =>
        if (k == acc.last._2 + 1) acc.init :+ (acc.last._1, k)
        else acc :+ (k, k)
    }.map { case (s, e) => (s, e, e - s + 1) }
  }

  test("sharded rank equals the global form on random key sets, across shard counts") {
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      // dense-ish draws so runs regularly cross shard boundaries
      val keys = Seq.fill(200 + trial * 100)(rng.nextLong(400) - 100)
      val expected = naiveIslands(keys)
      for (shards <- Seq(1, 3, 64)) {
        val got = Sequences.islands(keys.toDF("k"), "k", rankShards = shards)
          .orderBy("island_start")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got == expected, s"trial=$trial shards=$shards")
      }
    }
  }

  test("an island spanning every shard still pairs its endpoints") {
    // one contiguous run over the whole domain: start in shard 0, end in
    // the last shard — the cross-shard pairing must survive
    val got = Sequences.islands((0L to 99L).toDF("k"), "k", rankShards = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 99L, 100L)))
  }

  test("NULL keys are dropped, not islanded") {
    val got = Sequences.islands(
        Seq(Some(1L), None, Some(2L), Some(9L), None).toDF("k"), "k")
      .orderBy("island_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L), (9L, 9L, 1L)))
    assert(Sequences.islands(Seq[Option[Long]](None, None).toDF("k"), "k").count() == 0)
    assert(Sequences.islands(Seq.empty[Long].toDF("k"), "k").count() == 0)
  }

  test("every window in the plan is partitioned (no single-task global sort)") {
    val df = Sequences.islands((1L to 50L).toDF("k"), "k")
    val plan = df.queryExecution.executedPlan.toString
    val specs = raw"windowspecdefinition\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected window nodes in the plan:\n$plan")
    assert(specs.forall(_.contains("__t")),
      s"found a window not partitioned by (__t, __shard): $specs")
  }
}
