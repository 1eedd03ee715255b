package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "v")

  test("update, delete, insert, and persist arms all apply in one pass") {
    val source = Seq(
      (2L, "b2", 21.0),   // matched → update v only (name keeps target's)
      (3L, "DEL", 0.0),   // matched + delete condition → dropped
      (9L, "new", 90.0)   // unmatched → insert
    ).toDF("k", "name", "v")
    val got = Merge.merge(target, source, Seq("k"),
        whenMatchedDelete = Some(Merge.s("name") === "DEL"),
        whenMatchedUpdateSet = Map("v" -> Merge.s("v")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, "a", 10.0),   // target-only persists
      (2L, "b", 21.0),   // updated v, original name
      (4L, "d", 40.0),
      (9L, "new", 90.0)))
  }

  test("no update clause: matched target rows persist unchanged") {
    val source = Seq((2L, "x", 99.0)).toDF("k", "name", "v")
    val got = Merge.merge(target, source, Seq("k"), whenNotMatchedInsert = false)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got == Set((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)))
  }

  test("NULL keys never match: source inserts, target persists") {
    val t0 = Seq((Option(1L), 10.0), (Option.empty[Long], 0.0)).toDF("k", "v")
    val s0 = Seq((Option.empty[Long], 99.0)).toDF("k", "v")
    val got = Merge.merge(t0, s0, Seq("k"),
        whenMatchedUpdateSet = Map("v" -> Merge.s("v")))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getDouble(1))).toSet
    assert(got == Set((Some(1L), 10.0), (None, 0.0), (None, 99.0)))
  }

  test("update assignments can mix both row images") {
    val source = Seq((1L, "a", 5.0)).toDF("k", "name", "v")
    val got = Merge.merge(target, source, Seq("k"),
        whenMatchedUpdateSet = Map("v" -> (Merge.t("v") + Merge.s("v"))))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got(1L) == 15.0)
  }

  test("bySource clauses: stale target-only rows delete, the rest take tombstone assignments") {
    val source = Seq(
      (2L, "b2", 21.0),  // matched → update v
      (9L, "new", 90.0)  // unmatched → insert
    ).toDF("k", "name", "v")
    // snapshot-sync: drop target-only rows below v=35, flag the rest
    val got = Merge.merge(target, source, Seq("k"),
        whenMatchedUpdateSet = Map("v" -> Merge.s("v")),
        whenNotMatchedBySourceDelete = Some(Merge.t("v") < 35.0),
        whenNotMatchedBySourceUpdateSet = Map("name" -> concat(lit("stale:"), Merge.t("name"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (2L, "b", 21.0),          // matched update
      (4L, "stale:d", 40.0),    // target-only, v>=35 → tombstoned
      (9L, "new", 90.0)))       // insert; k=1 (v=10) and k=3 (v=30) deleted
  }

  test("unconditional bySource delete is the full snapshot sync") {
    val source = Seq((2L, "b", 99.0)).toDF("k", "name", "v")
    val got = Merge.merge(target, source, Seq("k"),
        whenMatchedUpdateSet = Map("v" -> Merge.s("v")),
        whenNotMatchedBySourceDelete = Some(lit(true)))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got == Set((2L, 99.0)))
  }

  test("schema mismatch and unknown assignment columns are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Merge.merge(target, target.drop("name"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Merge.merge(target, target, Seq("k"),
        whenMatchedUpdateSet = Map("nope" -> lit(1)))
    }
  }
}
