package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Fused MinHash minima: given the per-shingle base hashes
  * `x_i = xxhash64(s_i) mod p` (array<long>, non-negative), computes
  * `sig[j] = min_i((a_j·x_i + b_j) mod p)` for all j in one pass.
  *
  * Why an Expression: the higher-order composition
  * (`transform(sequence(0, H−1), j -> array_min(transform(base, …)))`)
  * allocates H intermediate arrays per row and walks the base array H
  * times through lambda-variable indirection. This kernel keeps H
  * primitive accumulators and walks the base array once, and its
  * `doGenCode` emits a plain Java loop nest inside whole-stage codegen.
  * Arithmetic is IDENTICAL to the HOF form (a_j, b_j < p = 2³¹−1 and
  * x < p, so a_j·x + b_j < 2⁶² never wraps a long; `%` equals `pmod`
  * on the non-negative operands), so signatures — and every gate output
  * derived from them — are bit-for-bit unchanged; MinHashSpec
  * cross-checks against the HOF reference form.
  *
  * Null/empty semantics mirror the HOF form: null input → null output;
  * empty input → an array of H nulls (array_min of an empty array is
  * null); null ELEMENTS are not expected (base hashes are never null).
  */
case class MinHashMins(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression {

  require(as.length == bs.length, "coefficient arity mismatch")
  private val numHashes = as.length

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_mins expects array<bigint>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = (as(j) * xi + bs(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$numHashes]);
         |} else {
         |  final long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $xi = $a.getLong($i);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      final long $h = ($asRef[$j] * $xi + $bsRef[$j]) % ${p}L;
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash {
  /** Column entry point: fused minima over a base-hash array. */
  def mins(baseHashes: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    GraftColumnBridge.column(MinHashMins(
      GraftColumnBridge.expression(baseHashes), as, bs, p))
}
