package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, IntegerLiteral}

/** SQL-callable surface for the library's kernels: a `spark.sql` author
  * gets the same fused expressions the DataFrame API uses, under
  * `graft_`-prefixed names. Each builder composes the Column-level
  * implementation through the Expression<->Column bridge, so SQL and
  * DataFrame callers share one code path (and one set of specs).
  *
  * Registered by `GraftExtensions.install` (temp functions on an
  * existing session). Arities/literalness are validated eagerly at
  * resolution, not at runtime.
  */
object SqlFunctions {

  private def col(e: Expression) = GraftColumnBridge.column(e)
  // full ColumnNode conversion — registry output goes straight to the
  // analyzer, which cannot see through deferred Column adapters
  private def expr(c: org.apache.spark.sql.Column) = GraftColumnBridge.toExpressionTree(c)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry

    // graft_minhash(shingles ARRAY<STRING>, numHashes INT-literal) -> ARRAY<BIGINT>
    reg.createOrReplaceTempFunction("graft_minhash", exprs => {
      require(exprs.length == 2, "graft_minhash(shingles, numHashes) takes 2 arguments")
      val n = exprs(1) match {
        case IntegerLiteral(v) if v > 0 => v
        case other => throw new IllegalArgumentException(
          s"graft_minhash: numHashes must be a positive INT literal, got $other")
      }
      expr(graft.pipeline.Dedup.minHashSignature(col(exprs.head), n))
    }, "built-in")

    // graft_intersection_size(a ARRAY, b ARRAY) -> BIGINT (fused, no
    // intermediate intersection array)
    reg.createOrReplaceTempFunction("graft_intersection_size", exprs => {
      require(exprs.length == 2,
        "graft_intersection_size takes exactly 2 arguments")
      IntersectionSize(exprs.head, exprs(1))
    }, "built-in")

    // graft_simhash(text STRING) -> BIGINT (64-bit xxhash64 SimHash)
    reg.createOrReplaceTempFunction("graft_simhash", exprs => {
      require(exprs.length == 1, "graft_simhash takes exactly 1 argument")
      // simHashExpr is keyed by column NAME; route through the bridge by
      // aliasing the argument expression into the composition
      expr(graft.pipeline.Dedup.simHashOf(col(exprs.head)))
    }, "built-in")

    // graft_quantize(vec ARRAY<FLOAT|DOUBLE>) -> STRUCT<mn, mx, q ARRAY<INT>>
    reg.createOrReplaceTempFunction("graft_quantize", exprs => {
      require(exprs.length == 1, "graft_quantize takes exactly 1 argument")
      expr(graft.pipeline.Similarity.quantizeInt8(col(exprs.head)))
    }, "built-in")

    // graft_dequantize(qv STRUCT<mn, mx, q>) -> ARRAY<DOUBLE>
    reg.createOrReplaceTempFunction("graft_dequantize", exprs => {
      require(exprs.length == 1, "graft_dequantize takes exactly 1 argument")
      expr(graft.pipeline.Similarity.dequantizeInt8(col(exprs.head)))
    }, "built-in")

    // graft_shingles(text STRING, n INT-literal) -> ARRAY<STRING>
    reg.createOrReplaceTempFunction("graft_shingles", exprs => {
      require(exprs.length == 2, "graft_shingles(text, n) takes 2 arguments")
      val n = exprs(1) match {
        case IntegerLiteral(v) if v > 0 => v
        case other => throw new IllegalArgumentException(
          s"graft_shingles: n must be a positive INT literal, got $other")
      }
      expr(graft.pipeline.Dedup.shinglesOf(col(exprs.head), n))
    }, "built-in")

    // graft_normalize(text STRING) -> STRING (canonical corpus text:
    // control chars -> space, whitespace collapsed, trimmed, lowercased)
    reg.createOrReplaceTempFunction("graft_normalize", exprs => {
      require(exprs.length == 1, "graft_normalize takes exactly 1 argument")
      expr(graft.pipeline.Text.normalize(col(exprs.head)))
    }, "built-in")
  }
}
