package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrites the pure-builtin dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[VectorDot]] expression. Users writing the
  * portable higher-order-function form (or porting SQL that uses it)
  * silently get the tight primitive loop — ~5× on pairwise scoring —
  * without changing their query. Semantics are identical by
  * construction (strict left-to-right summation from 0.0, null on
  * length mismatch or null elements; see [[VectorDot]]'s scaladoc), so
  * the rewrite is safe wherever the pattern matches; anything that
  * deviates (different zero, reordered operands, extra finish logic)
  * is left untouched.
  *
  * Wired by [[graft.GraftExtensions]] (`injectOptimizerRule`) for
  * spark.sql.extensions deployments and by
  * [[VectorFunctions.register]] via `experimental.extraOptimizations`
  * for runtime registration.
  */
object VectorDotRewrite extends Rule[LogicalPlan] {

  /** Strip the `cast("array<double>")` the HOF form needs (VectorDot
    * widens float elements itself); accept only float/double arrays. */
  private def stripToNumericArray(e: Expression): Option[Expression] = e match {
    case Cast(child, ArrayType(DoubleType, _), _, _) => stripToNumericArray(child)
    case other => other.dataType match {
      case ArrayType(FloatType | DoubleType, _) => Some(other)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(la, ra,
            LambdaFunction(
              Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(aAcc: NamedLambdaVariable, aV: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(fArg: NamedLambdaVariable), _))
          if mx.exprId == zx.exprId && my.exprId == zy.exprId &&
            acc.exprId == aAcc.exprId && v.exprId == aV.exprId &&
            fin.exprId == fArg.exprId =>
        (stripToNumericArray(la), stripToNumericArray(ra)) match {
          case (Some(l), Some(r)) => VectorDot(l, r)
          case _ => agg
        }
    }
}
