package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class MomentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flagOutliers flags exactly the rows beyond z population sigmas") {
    // group a: nine values at 10, one at 100 — the 100 is an obvious outlier
    // (mean 19, var ~729 -> sigma 27; dev 81 > 2*27). The 10s sit 9 below
    // the mean (dev^2 81 < 4*729), not outliers.
    val rows = (1 to 9).map(i => (i.toLong, "a", 10L)) :+ ((10L, "a", 100L))
    val df = rows.toDF("id", "grp", "v")
    val flagged = Moments.flagOutliers(df, "v", "grp", z = 2.0)
    val out = flagged.filter(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(out == Set(10L))
    // every row keeps its group census
    assert(flagged.select("n_group").distinct().as[Long].collect().toSeq == Seq(10L))
  }

  test("single-row and constant groups never flag (zero variance, zero dev)") {
    val df = Seq((1L, "solo", 42L), (2L, "const", 7L), (3L, "const", 7L))
      .toDF("id", "grp", "v")
    assert(Moments.flagOutliers(df, "v", "grp", z = 2.0)
      .filter(col("is_outlier")).count() == 0)
  }

  test("flag is partition-invariant (integer moments, fixed IEEE sequence)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Moments.flagOutliers(d, "n_chars", "source", z = 2.0)
        .filter(col("is_outlier")).select("doc_id").as[Long].collect().toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("reserved and colliding names are rejected eagerly") {
    val df = Seq((1L, "a", 2L)).toDF("id", "grp", "v")
    assertThrows[IllegalArgumentException](
      Moments.flagOutliers(df.withColumn("is_outlier", lit(true)), "v", "grp", z = 2.0))
    assertThrows[IllegalArgumentException](
      Moments.flagOutliers(df.withColumn("n_group", lit(1L)), "v", "grp", z = 2.0))
    assertThrows[IllegalArgumentException](
      Moments.flagOutliers(df, "v", "grp", z = 0.0))
  }
}
