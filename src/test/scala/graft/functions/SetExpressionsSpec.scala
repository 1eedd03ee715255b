package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SetExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("intersectionSize matches size(array_intersect) on tricky inputs") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a")),            // dup in a counted once
      (Seq[String](), Seq("x")),
      (Seq("x"), Seq[String]()),
      (Seq("a", null, "b"), Seq(null, "b")),     // null in both counted once
      (Seq("a", null), Seq("a"))).toDF("a", "b") // null only on one side
    val got = df.select(
      SetExpressions.intersectionSize(col("a"), col("b")).as("fused"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fused ${r.getLong(0)} != builtin ${r.getLong(1)}"))
  }

  test("null array input propagates null") {
    val df = Seq((Option(Seq("a")), Option.empty[Seq[String]])).toDF("a", "b")
    val r = df.select(SetExpressions.intersectionSize(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("interpreted eval agrees with the static kernel") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*) =
      ArrayData.toArrayData(xs.map(s => if (s == null) null else UTF8String.fromString(s)).toArray)
    assert(IntersectionSize.compute(arr("a", "b"), arr("b", "c")) == 1L)
    assert(IntersectionSize.compute(arr("a", "a"), arr("a")) == 1L)
    assert(IntersectionSize.compute(arr(), arr("a")) == 0L)
  }
}
