package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused set-overlap kernel for the Jaccard verification tier.
  *
  * `size(array_intersect(a, b))` + `size(array_union(a, b))` build two
  * hash sets AND materialize both result arrays per pair — just to take
  * their lengths. This expression computes |a ∩ b| with one hash set and
  * no output array; |a ∪ b| follows arithmetically for the (distinct)
  * shingle arrays the dedup tier produces: |A∪B| = |A| + |B| − |A∩B|.
  * In an all-pairs or candidate-pair join the pair count is the hot
  * dimension, so the per-pair constant matters.
  *
  * Semantics match `array_intersect` exactly: the count is over DISTINCT
  * elements of `a` present in `b` (duplicates in `a` counted once, a
  * null element counted once if present in both sides).
  */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intersection_size expects two array<string> inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectionSize.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = IntersectionSize.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectionSize {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val nb = b.numElements()
    val bSet = new java.util.HashSet[UTF8String](Math.max(8, nb * 2))
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else bSet.add(b.getUTF8String(i))
      i += 1
    }
    val na = a.numElements()
    // `seen` dedups a's elements (array_intersect counts distinct matches)
    val seen = new java.util.HashSet[UTF8String](Math.max(8, na * 2))
    var count = 0L
    var aNullCounted = false
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !aNullCounted) { count += 1; aNullCounted = true }
      } else {
        val e = a.getUTF8String(i)
        if (bSet.contains(e) && seen.add(e)) count += 1
      }
      i += 1
    }
    count
  }
}

object SetExpressions {
  /** |a ∩ b| over two array<string> columns (distinct-match count). */
  def intersectionSize(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectionSize(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
