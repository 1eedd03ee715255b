package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.pipeline.Similarity

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native cosine agrees bitwise with the higher-order-function form") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings").limit(200)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib")).limit(5000)
    val diff = pairs.select(
        VectorExpressions.cosine(col("va"), col("vb")).as("native"),
        Similarity.cosineHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("null inputs yield null; length mismatch raises") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f))),
      (None, Some(Seq(1.0f, 2.0f)))).toDF("a", "b")
    val got = df.select(VectorExpressions.cosine(col("a"), col("b")).as("c")).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(got(1).isNullAt(0))

    val bad = Seq((Seq(1.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assertThrows[Exception] {
      bad.select(VectorExpressions.cosine(col("a"), col("b"))).collect()
    }
  }

  test("fused band codes equal the composed-builtin form") {
    val planes = Similarity.hyperplanes(120, 64)
    val emb = Tables.load(spark, TestSpark.sf, "embeddings").limit(100)
    val fused = emb.select(col("vec_id"),
        VectorExpressions.bandCodes(col("embedding"), planes, 6).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val composed = emb.select(col("vec_id") +:
        Similarity.bandCodesHof(col("embedding"), planes, 6)
          .zipWithIndex.map { case (c, i) => c.as(s"b$i") }: _*)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong).toSeq).toMap
    assert(fused == composed)
  }

  test("band codes ignore trailing planes when planes.length is not a bandBits multiple") {
    // 120 planes / 7 bits = 17 bands using 119 planes; the 120th plane
    // must be ignored (not write past the codes array) — matching the
    // HOF form's behavior
    val planes = Similarity.hyperplanes(120, 64)
    val emb = Tables.load(spark, TestSpark.sf, "embeddings").limit(50)
    val fused = emb.select(col("vec_id"),
        VectorExpressions.bandCodes(col("embedding"), planes, 7).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val composed = emb.select(col("vec_id") +:
        Similarity.bandCodesHof(col("embedding"), planes, 7)
          .zipWithIndex.map { case (c, i) => c.as(s"b$i") }: _*)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong).toSeq).toMap
    assert(fused.values.head.size == 17)
    assert(fused == composed)
  }

  test("graft_cosine is callable from SQL after registration") {
    VectorExpressions.register(spark)
    Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs").as[Double].collect().head
    assert(math.abs(got) < 1e-12)
  }

  test("double-typed arrays work through the same expression") {
    val df = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
    val got = df.select(VectorExpressions.cosine(col("a"), col("b"))).as[Double].collect().head
    assert(math.abs(got - 24.0 / 25.0) < 1e-12)
  }
}
