package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two vector
  * columns (array<float> or array<double>).
  *
  * Why an Expression and not `zip_with`+`aggregate`: the higher-order
  * form allocates an intermediate product array per row and evaluates
  * three separate aggregates (dot, |a|², |b|²), each walking the arrays
  * through lambda-variable indirection. This expression makes ONE fused
  * pass over the two arrays with primitive accumulators, and its
  * `doGenCode` emits a plain Java loop so it participates in whole-stage
  * codegen — the preference order from the build notes: builtin
  * composition < native Expression < UDF, chosen here because the kernel
  * sits inside an O(n·m) similarity join.
  *
  * Null semantics: null if either input is null (standard binary
  * expression contract); mismatched lengths raise, zero-norm inputs
  * return NaN (caller filters).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosine_similarity expects array<float|double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n, s"vector length mismatch: $n vs ${y.numElements()}")
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rightGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException("vector length mismatch: " + $n +
         |    " vs " + $b.numElements());
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double x = (double) $a.$leftGet($i);
         |  final double y = (double) $b.$rightGet($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass random-hyperplane band codes: projects the input vector on
  * every plane and packs the sign bits into per-band integer codes.
  *
  * The composed form (`bands × bandBits` separate dot-product columns)
  * walks the vector once per plane through lambda indirection; this
  * expression walks it once TOTAL, with the plane matrix as a flat
  * primitive array baked into the expression. Interpreted eval with a
  * tight loop (CodegenFallback): the win is the fused pass, not codegen.
  */
case class HyperplaneBandCodes(child: Expression, planes: Array[Array[Double]], bandBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val numPlanes = planes.length
  private val nBands = numPlanes / bandBits
  @transient private lazy val flat: Array[Double] = {
    val dim = planes.head.length
    val a = new Array[Double](numPlanes * dim)
    var p = 0
    while (p < numPlanes) {
      System.arraycopy(planes(p), 0, a, p * planes(p).length, planes(p).length)
      p += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"band_codes expects array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      vec(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val codes = new Array[Long](nBands)
    // only full bands participate: planes beyond nBands*bandBits are
    // ignored (same contract as the HOF cross-check form); looping to
    // numPlanes would index codes(p/bandBits) past the array end
    val used = nBands * bandBits
    var p = 0
    while (p < used) {
      var dot = 0.0
      val base = p * dim
      var d = 0
      while (d < dim) { dot += vec(d) * flat(base + d); d += 1 }
      if (dot > 0) codes(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level entry point: `cosine(colA, colB)`. */
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** array<long> of per-band sign codes for the given hyperplanes. */
  def bandCodes(v: Column, planes: Array[Array[Double]], bandBits: Int): Column =
    GraftColumnBridge.column(HyperplaneBandCodes(
      GraftColumnBridge.expression(v), planes, bandBits))

  /** Register `graft_cosine(a, b)` as a SQL-callable function on the
    * session, so `spark.sql("... graft_cosine(x, y) ...")` reaches the
    * native kernel too.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => {
        require(exprs.length == 2, "graft_cosine takes exactly 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "built-in")
}
