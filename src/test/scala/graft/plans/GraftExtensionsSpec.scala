package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.pipeline.Similarity

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("optimizer rule rewrites the HOF cosine composition to the native kernel") {
    GraftExtensions.install(spark)
    // deterministic pair set (a limit on an unordered cross join would
    // pick different rows in the two compared jobs)
    val emb = Tables.load(spark, TestSpark.sf, "embeddings").filter(col("vec_id") < 40)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib"))
    val hof = pairs.select(col("ia"), col("ib"),
      Similarity.cosineHof(col("va"), col("vb")).as("cos"))
    // the optimized plan must contain the fused expression, not the
    // aggregate/zip_with composition
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosinesimilarity") || optimized.contains("CosineSimilarity"),
      s"rule did not fire:\n$optimized")
    // and the results still equal the direct native form bitwise
    val native = pairs.select(col("ia"), col("ib"),
      Similarity.cosine(col("va"), col("vb")).as("cos"))
    assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty)
  }

  test("rule does not match a sum-of-squares over norms (x*x, not x*y)") {
    GraftExtensions.install(spark)
    // same Divide(agg(zip_with), sqrt*sqrt) shell, but the product lambda
    // squares ONE variable — a rewrite here would silently change results
    val df = Tables.load(spark, TestSpark.sf, "embeddings").limit(5)
      .select(col("embedding").as("a"), col("embedding").as("b"))
      .selectExpr("""aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(x as double)),
        cast(0.0 as double), (acc, v) -> acc + v) /
        (sqrt(aggregate(zip_with(a, a, (x, y) -> cast(x as double) * cast(y as double)),
          cast(0.0 as double), (acc, v) -> acc + v)) *
         sqrt(aggregate(zip_with(b, b, (x, y) -> cast(x as double) * cast(y as double)),
          cast(0.0 as double), (acc, v) -> acc + v))) as r""")
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("cosinesimilarity"))
    assert(df.collect().length == 5)
  }

  test("rule leaves non-cosine aggregates alone") {
    GraftExtensions.install(spark)
    val df = Tables.load(spark, TestSpark.sf, "embeddings").limit(10)
      .select(aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("dot_only"))
    // a bare dot product (no /norm*norm shape) must not be rewritten
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("cosinesimilarity"))
    assert(df.collect().length == 10)
  }
}
