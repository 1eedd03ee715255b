package graft.validation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rows matching on a NULL key component classify as match, not missing+extra") {
    val src = Seq((Option(1L), "a"), (Option.empty[Long], "b")).toDF("pk", "v")
    val tgt = Seq((Option(1L), "a"), (Option.empty[Long], "b")).toDF("pk", "v")
    val kinds = Diff.fullDiff(src, tgt, Seq("pk"), Seq("v"))
      .collect().map(_.getString(1))
    assert(kinds.forall(_ == "match"), kinds.mkString(","))
  }

  test("null-key rows present on one side only still classify as missing/extra") {
    val src = Seq((Option.empty[Long], "b")).toDF("pk", "v")
    val tgt = spark.emptyDataset[(Option[Long], String)].toDF("pk", "v")
    val kinds = Diff.fullDiff(src, tgt, Seq("pk"), Seq("v"))
      .collect().map(_.getString(1))
    assert(kinds.toSeq == Seq("missing_target"))
  }

  test("mismatch on a null-keyed row is attributed by HashRefinement") {
    val src = Seq((Option(1L), "x", "same"), (Option.empty[Long], "y", "same"))
      .toDF("pk", "payload", "other")
    val tgt = Seq((Option(1L), "x", "same"), (Option.empty[Long], "CHANGED", "same"))
      .toDF("pk", "payload", "other")
    val got = HashRefinement.refine(src, tgt, Seq("pk"), Seq("payload", "other"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1))
    assert(got.toSeq == Seq(None -> "payload")) // null-keyed mismatch is found and attributed
  }

  test("timestamp tolerance applies in row compare when configured") {
    import graft.validation.{RowComparisonFailure => RCF}
    val a = Seq[Any](new java.sql.Timestamp(1000L))
    val b = Seq[Any](new java.sql.Timestamp(1004L))
    // no tolerance: exact compare differs
    assert(RCF.compare(Seq("ts"), Some(a), Some(b)).isDefined)
    // 5 ms tolerance: equal
    assert(RCF.compare(Seq("ts"), Some(a), Some(b), timestampToleranceMs = 5L).isEmpty)
    // cross-type within tolerance: Timestamp vs Instant of the same epoch
    val c = Seq[Any](java.time.Instant.ofEpochMilli(1001L))
    assert(RCF.compare(Seq("ts"), Some(a), Some(c), timestampToleranceMs = 5L).isEmpty)
  }
}
