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

  test("SQL surface: graft_ functions run the same kernels as the API") {
    GraftExtensions.install(spark)
    Tables.load(spark, TestSpark.sf, "documents").limit(50)
      .createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_minhash(graft_shingles(text, 3), 16) AS sig,
        |  graft_simhash(text) AS sh,
        |  graft_intersection_size(graft_shingles(text, 1),
        |                          graft_shingles(text, 1)) AS self_isect
        |FROM sqlfn_docs""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getLong(2), r.getLong(3)))).toMap
    val viaApi = Tables.load(spark, TestSpark.sf, "documents").limit(50)
      .select(col("doc_id"),
        graft.pipeline.Dedup.minHashSignature(
          graft.pipeline.Dedup.shingles("text", 3), 16).as("sig"),
        graft.pipeline.Dedup.simHashExpr("text").as("sh"),
        size(graft.pipeline.Dedup.shingles("text", 1)).cast("long").as("n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getLong(2), r.getLong(3)))).toMap
    assert(viaSql == viaApi) // self-intersection == shingle count
    // non-literal numHashes is rejected at resolution
    val e = intercept[Exception](
      spark.sql("SELECT graft_minhash(graft_shingles(text, 2), doc_id) FROM sqlfn_docs")
        .collect())
    assert(e.getMessage.contains("numHashes") || e.getMessage.contains("literal"))

    // quantize round trip from pure SQL: reconstruction within half a step
    Tables.load(spark, TestSpark.sf, "embeddings").limit(20)
      .createOrReplaceTempView("sqlfn_emb")
    val bad = spark.sql(
      """SELECT vec_id FROM (
        |  SELECT vec_id, graft_quantize(embedding) AS qv, embedding FROM sqlfn_emb)
        |WHERE aggregate(zip_with(embedding, graft_dequantize(qv),
        |        (x, y) -> abs(cast(x as double) - y)),
        |      cast(0.0 as double), (a, b) -> greatest(a, b))
        |    > (qv.mx - qv.mn) / 255.0 / 2.0 + 1e-12""".stripMargin)
    assert(bad.count() == 0)

    // normalize from pure SQL
    assert(spark.sql("SELECT graft_normalize('  A \tB  ') AS n").head().getString(0)
      == "a b")
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
