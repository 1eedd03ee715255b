package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSimilarity

/** Catalyst optimizer rule: recognize the portable higher-order-function
  * cosine composition
  *
  *   aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, +)
  *     / (sqrt(aggregate(zip_with(a, a, …))) * sqrt(aggregate(zip_with(b, b, …))))
  *
  * and replace it with the fused native `CosineSimilarity(a, b)` kernel
  * (one pass over both arrays, whole-stage codegen, no intermediate
  * product arrays). The two forms are bitwise-equal (both fold left in
  * double precision — VectorExpressionsSpec proves it), so the rewrite
  * is semantics-preserving at the bit level.
  *
  * This is the optimizer-extension tier of the engine: users (or SQL
  * authors) can write the portable HOF form and still execute the fused
  * kernel — the same "declare the plan, let the engine pick the
  * physical form" contract the rest of the library follows.
  */
object NativeCosineRewrite extends Rule[LogicalPlan] {

  /** Matches Σ xᵢ·yᵢ built from aggregate(zip_with(x, y, *), 0.0, +)
    * (with or without casts-to-double inside the product lambda) and
    * returns the two array expressions.
    */
  private object DotProduct {
    private def stripCast(e: Expression): Expression = e match {
      case Cast(c, DoubleType, _, _) => stripCast(c)
      case other => other
    }
    private def isVar(e: Expression, v: NamedExpression): Boolean = e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul: Multiply, zipArgs, _)),
            Literal(zero, DoubleType),
            LambdaFunction(add: Add, mergeArgs, _),
            LambdaFunction(fin: NamedLambdaVariable, finArgs, _))
          if zero == 0.0 && zipArgs.length == 2 && mergeArgs.length == 2 &&
            // the product must be exactly x*y over the two DISTINCT zip
            // variables (x*x — a sum of squares — must NOT match)
            isVar(stripCast(mul.left), zipArgs.head) &&
            isVar(stripCast(mul.right), zipArgs(1)) &&
            // the merge must be exactly acc + v over the merge variables
            isVar(add.left, mergeArgs.head) && isVar(add.right, mergeArgs(1)) &&
            // and the finish lambda must be the identity
            finArgs.length == 1 && isVar(fin, finArgs.head) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            DotProduct(a, b),
            Multiply(Sqrt(DotProduct(a1, a2)), Sqrt(DotProduct(b1, b2)), _),
            _)
          if a1.semanticEquals(a) && a2.semanticEquals(a) &&
            b1.semanticEquals(b) && b2.semanticEquals(b) =>
        CosineSimilarity(a, b)
    }
}

/** Session extensions: inject the optimizer rule and the SQL-callable
  * native functions. Use via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` for new
  * sessions, or `GraftExtensions.install(spark)` to hook an existing
  * one (experimental extraOptimizations).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => NativeCosineRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(NativeCosineRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeCosineRewrite
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    graft.functions.VectorExpressions.register(spark)
    graft.functions.SqlFunctions.register(spark)
  }
}
