package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property sweep for the ANSI MERGE operator: randomized keyed
  * snapshots + change sets are merged by a 10-line Scala model of the
  * clause semantics (matched-delete, matched-update, unmatched-insert,
  * persist) and the distributed merge must agree exactly. Seeds cover:
  * disjoint/overlapping key sets, delete-all, update-all, empty
  * source, empty target.
  */
// top-level so Spark can derive an Encoder (inner case classes can't)
case class MergePropRow(k: Long, tag: String, v: Double)

class MergePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type R = MergePropRow
  private def R(k: Long, tag: String, v: Double) = MergePropRow(k, tag, v)

  private def model(target: Seq[R], source: Seq[R]): Set[R] = {
    val srcByKey = source.map(r => r.k -> r).toMap
    val tKeys = target.map(_.k).toSet
    val fromTarget = target.flatMap { t =>
      srcByKey.get(t.k) match {
        case Some(s) if s.tag == "DEL" => None                  // matched delete
        case Some(s)                   => Some(t.copy(v = s.v)) // matched update (v only)
        case None                      => Some(t)               // persist
      }
    }
    val inserts = source.filterNot(s => tKeys.contains(s.k))    // unmatched insert
    (fromTarget ++ inserts).toSet
  }

  test("randomized snapshots agree with the clause model") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val nT = rnd.nextInt(40)
      val nS = rnd.nextInt(40)
      val target = (0 until nT).map(i => R(rnd.nextInt(30).toLong, s"t$i", rnd.nextInt(100)))
        .groupBy(_.k).map(_._2.head).toSeq // unique target keys
      val source = (0 until nS).map { i =>
        val tag = if (rnd.nextBoolean() && rnd.nextBoolean()) "DEL" else s"s$i"
        R(rnd.nextInt(30).toLong, tag, rnd.nextInt(100))
      }.groupBy(_.k).map(_._2.head).toSeq // unique source keys (MERGE contract)
      val got = Merge.merge(target.toDF("k", "tag", "v"), source.toDF("k", "tag", "v"),
          Seq("k"),
          whenMatchedDelete = Some(Merge.s("tag") === "DEL"),
          whenMatchedUpdateSet = Map("v" -> Merge.s("v")))
        .as[R].collect().toSet
      assert(got == model(target, source), s"trial $trial: t=$target s=$source")
    }
  }

  test("randomized snapshots agree with the full clause model including bySource") {
    def modelFull(target: Seq[R], source: Seq[R]): Set[R] = {
      val srcByKey = source.map(r => r.k -> r).toMap
      val tKeys = target.map(_.k).toSet
      val fromTarget = target.flatMap { t =>
        srcByKey.get(t.k) match {
          case Some(s) if s.tag == "DEL" => None                  // matched delete
          case Some(s)                   => Some(t.copy(v = s.v)) // matched update (v only)
          case None if t.v < 50          => None                  // bySource delete
          case None                      => Some(t.copy(tag = "stale:" + t.tag)) // bySource update
        }
      }
      val inserts = source.filterNot(s => tKeys.contains(s.k))    // unmatched insert
      (fromTarget ++ inserts).toSet
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val target = (0 until rnd.nextInt(40)).map(i =>
          R(rnd.nextInt(30).toLong, s"t$i", rnd.nextInt(100)))
        .groupBy(_.k).map(_._2.head).toSeq
      val source = (0 until rnd.nextInt(40)).map { i =>
        val tag = if (rnd.nextBoolean() && rnd.nextBoolean()) "DEL" else s"s$i"
        R(rnd.nextInt(30).toLong, tag, rnd.nextInt(100))
      }.groupBy(_.k).map(_._2.head).toSeq
      val got = Merge.merge(target.toDF("k", "tag", "v"), source.toDF("k", "tag", "v"),
          Seq("k"),
          whenMatchedDelete = Some(Merge.s("tag") === "DEL"),
          whenMatchedUpdateSet = Map("v" -> Merge.s("v")),
          whenNotMatchedBySourceDelete = Some(Merge.t("v") < 50.0),
          whenNotMatchedBySourceUpdateSet =
            Map("tag" -> concat(lit("stale:"), Merge.t("tag"))))
        .as[R].collect().toSet
      assert(got == modelFull(target, source), s"trial $trial: t=$target s=$source")
    }
  }

  test("empty source and empty target edges") {
    val t0 = Seq(R(1L, "a", 1.0)).toDF("k", "tag", "v")
    val empty = Seq.empty[R].toDF("k", "tag", "v")
    assert(Merge.merge(t0, empty, Seq("k")).as[R].collect().toSet == Set(R(1L, "a", 1.0)))
    assert(Merge.merge(empty, t0, Seq("k")).as[R].collect().toSet == Set(R(1L, "a", 1.0)))
    assert(Merge.merge(empty, t0, Seq("k"), whenNotMatchedInsert = false)
      .as[R].collect().isEmpty)
  }
}
