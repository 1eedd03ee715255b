package graft.validation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Constraints._

class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame, cs: Seq[Constraint]) =
    Constraints.check(df, cs).as[(String, Long, Boolean)].collect()
      .map { case (n, v, p) => n -> ((v, p)) }.toMap

  test("clean table passes every constraint with zero violations") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "cat", "v")
    val ref = Seq("a", "b", "c", "d").toDF("cat_ref")
    val r = report(df, Seq(
      NotNull("id"), Unique(Seq("id")), Bounds("v", lit(0.0), lit(100.0)),
      InSet("cat", Seq("a", "b", "c")), ForeignKey("cat", ref, "cat_ref"),
      RowCountBetween(1, 10)))
    assert(r.values.forall { case (v, p) => v == 0L && p })
  }

  test("each violation kind is counted and fails exactly its constraint") {
    val df = Seq(
      (Some(1L), Some("a"), Some(5.0)),
      (Some(1L), Some("z"), Some(-1.0)), // dup id, bad cat, out of bounds
      (None, Some("b"), None),           // null id
      (Some(3L), None, Some(200.0))      // null cat ignored by InSet/FK, v too big
    ).toDF("id", "cat", "v")
    val ref = Seq("a", "b").toDF("cat_ref")
    val r = report(df, Seq(
      NotNull("id"), Unique(Seq("id")), Bounds("v", lit(0.0), lit(100.0)),
      InSet("cat", Seq("a", "b")), ForeignKey("cat", ref, "cat_ref"),
      RowCountBetween(1, 3)))
    assert(r("not_null(id)") == ((1L, false)))
    assert(r("unique(id)") == ((2L, false)))      // both rows of the duplicated key
    assert(r("bounds(v)") == ((2L, false)))       // -1 and 200; NULL v not counted
    assert(r("in_set(cat)") == ((1L, false)))     // "z"; NULL cat not counted
    assert(r("foreign_key(cat)") == ((1L, false)))
    assert(r("row_count") == ((1L, false)))       // 4 rows, max 3 → distance 1
  }

  test("empty table: scalar sums coalesce to zero, row_count reports the shortfall") {
    val df = Seq.empty[(Long, String)].toDF("id", "cat")
    val r = report(df, Seq(NotNull("id"), Unique(Seq("id")), RowCountBetween(2, 10)))
    assert(r("not_null(id)") == ((0L, true)))
    assert(r("unique(id)") == ((0L, true)))
    assert(r("row_count") == ((2L, false)))
  }

  test("all scalar constraints share one aggregation pass (single Aggregate over df)") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "cat", "v")
    val plan = Constraints.check(df, Seq(
      NotNull("id"), NotNull("cat"), Bounds("v", lit(0.0), lit(9.0)),
      InSet("cat", Seq("a")), RowCountBetween(0, 9)))
      .queryExecution.optimizedPlan.toString
    val aggs = "(?m)^\\s*[+:]?-?\\s*Aggregate".r.findAllIn(plan).size
    assert(aggs <= 2, s"expected one aggregate pass (+partial), got:\n$plan")
  }

  test("composite unique key counts rows in duplicated groups only") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x")).toDF("a", "b")
    val r = report(df, Seq(Unique(Seq("a", "b"))))
    assert(r("unique(a,b)") == ((2L, false)))
  }
}
