package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DecimalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonical string strips trailing zeros like the reference") {
    val df = Seq("2.50", "2.5", "0.00", "-0.0", "100", "10.010", "-3.1400")
      .toDF("s").select(col("s").cast("decimal(10,4)").as("d"))
    val got = df.select(Decimals.canonicalString(col("d")).as("c")).as[String].collect().toSeq
    assert(got == Seq("2.5", "2.5", "0", "0", "100", "10.01", "-3.14"))
  }

  test("withCanonicalKeys adds keys only for decimal columns") {
    val df = Seq((1, "x")).toDF("i", "s")
      .withColumn("d", lit("2.50").cast("decimal(10,2)"))
    val out = Decimals.withCanonicalKeys(df)
    assert(out.columns.toSet == Set("i", "s", "d", "d_canon"))
    assert(out.select("d_canon").as[String].collect().head == "2.5")
  }
}
