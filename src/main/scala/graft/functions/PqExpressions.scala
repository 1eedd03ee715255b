package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused native kernels for product quantization (pipeline/Pq).
  *
  * Why Expressions and not the composed builtin form: PQ's composed
  * encode is m·ksub separate `zip_with`+`aggregate` subtrees (and the
  * argmin reads its scores array twice), i.e. 512 aggregate expressions
  * at m=16, ksub=16 — the expression TREE, not the data, becomes the
  * cost: analysis + codegen of the generated megamorphic Java runs for
  * seconds before the first row moves. Each kernel here is one tight
  * loop with the codebooks baked in as a flat primitive array (the
  * HyperplaneBandCodes pattern — CodegenFallback, because the win is
  * the fused pass, not codegen). All arithmetic mirrors the composed
  * form exactly: per-dimension (x−c)² accumulated left-to-right in
  * double, strict `<` argmin = first centroid on ties — PqSpec holds
  * the bit-identity cross-check.
  */
object PqExpressions {

  def encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(v), PqCodebooks(codebooks)))

  def decode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqDecode(GraftColumnBridge.expression(codes), PqCodebooks(codebooks)))

  def lut(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqLut(GraftColumnBridge.expression(v), PqCodebooks(codebooks)))

  /** Analysis-time element-type check shared by the vector-input
    * kernels: array<float|double> in, Left(error) otherwise. The
    * runtime twin [[PqCodebooks.elemIsFloat]] stays for direct eval
    * outside an analyzed plan.
    */
  private[functions] def vectorTypeCheck(dt: DataType, what: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$what expects array<float|double>, got ${other.catalogString}")
    }
}

/** Structurally-comparable codebook carrier. The PQ kernels are case
  * classes; an `Array`-typed field would give them identity-based
  * `equals`, defeating expression canonicalization and subexpression
  * elimination (two plans over the same codebooks would never compare
  * equal). The Vector field restores structural equality; the
  * eval-side flat primitive array is derived lazily and excluded from
  * equality/serialization footprint concerns.
  */
final case class PqCodebooks(m: Int, ksub: Int, dsub: Int, flat: Vector[Double]) {
  @transient lazy val flatArray: Array[Double] = flat.toArray

  private[functions] def elemIsFloat(dt: DataType, what: String): Boolean = dt match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$what expects array<float|double>, got $other")
  }
}

object PqCodebooks {
  /** codebooks(j)(c) = centroid c of subspace j; all subspaces must
    * carry the same centroid count and sub-dimension (checked here, at
    * construction, not mid-job).
    */
  def apply(codebooks: Array[Array[Array[Double]]]): PqCodebooks = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty && codebooks.head.head.nonEmpty,
      "PQ codebooks must be non-empty (m, ksub, dsub all >= 1)")
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    require(codebooks.forall(cb => cb.length == ksub && cb.forall(_.length == dsub)),
      s"ragged PQ codebooks: every subspace needs $ksub centroids of $dsub dims")
    val flat = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(j)(c), 0, flat, (j * ksub + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    PqCodebooks(m, ksub, dsub, flat.toVector)
  }
}

/** PQ codes: per subspace, the index of the (squared-L2) nearest
  * codebook centroid; first on ties.
  */
case class PqEncode(child: Expression, cb: PqCodebooks)
    extends UnaryExpression with CodegenFallback {

  private def m = cb.m
  private def ksub = cb.ksub
  private def dsub = cb.dsub
  @transient private lazy val flat = cb.flatArray
  private lazy val isFloat = cb.elemIsFloat(child.dataType, "pq_encode")

  override def checkInputDataTypes(): TypeCheckResult =
    PqExpressions.vectorTypeCheck(child.dataType, "pq_encode")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == m * dsub,
      s"pq_encode: vector length ${v.numElements()} != ${m * dsub}")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (isFloat) v.getFloat(j * dsub + d).toDouble
                  else v.getDouble(j * dsub + d)
          val diff = x - flat(base + d)
          acc += diff * diff
          d += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ reconstruction: concatenated codebook centroids per code. */
case class PqDecode(child: Expression, cb: PqCodebooks)
    extends UnaryExpression with CodegenFallback {

  private def m = cb.m
  private def ksub = cb.ksub
  private def dsub = cb.dsub
  @transient private lazy val flat = cb.flatArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_decode expects array<int> PQ codes, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    require(codes.numElements() == m, s"pq_decode: expected $m codes")
    val out = new Array[Double](m * dsub)
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      require(c >= 0 && c < ksub, s"pq_decode: code $c out of [0, $ksub)")
      System.arraycopy(flat, (j * ksub + c) * dsub, out, j * dsub, dsub)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC lookup table for one query vector: lut[j][c] = squared L2
  * distance between the query's subspace j and centroid c. ADC distance
  * to any code word is then m array lookups.
  */
case class PqLut(child: Expression, cb: PqCodebooks)
    extends UnaryExpression with CodegenFallback {

  private def m = cb.m
  private def ksub = cb.ksub
  private def dsub = cb.dsub
  @transient private lazy val flat = cb.flatArray
  private lazy val isFloat = cb.elemIsFloat(child.dataType, "pq_lut")

  override def checkInputDataTypes(): TypeCheckResult =
    PqExpressions.vectorTypeCheck(child.dataType, "pq_lut")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == m * dsub,
      s"pq_lut: vector length ${v.numElements()} != ${m * dsub}")
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val row = new Array[Double](ksub)
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (isFloat) v.getFloat(j * dsub + d).toDouble
                  else v.getDouble(j * dsub + d)
          val diff = x - flat(base + d)
          acc += diff * diff
          d += 1
        }
        row(c) = acc
        c += 1
      }
      rows(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
