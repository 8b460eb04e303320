package graft

import graft.functions.{VectorDot, VectorDotRewrite, VectorFunctions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: lets deployments wire the
  * engine's custom Catalyst surface at session-build time —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `builder.withExtensions(new GraftExtensions)`), making
  * `graft_vector_dot` available to pure-SQL users. Operators also
  * self-register at runtime ([[VectorFunctions.register]]), so the
  * extension is optional for DataFrame-API callers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(VectorFunctions.dotName),
      new ExpressionInfo(classOf[VectorDot].getName, VectorFunctions.dotName),
      (exprs: Seq[Expression]) => VectorDot(exprs.head, exprs(1))))
    // HOF-form dot products (aggregate(zip_with(...))) rewrite to the
    // codegen'd expression — see VectorDotRewrite
    ext.injectOptimizerRule(_ => VectorDotRewrite)
    // Native as-of join: plans graft.plans.AsOfJoinPlan as the
    // single-merge-pass AsOfJoinExec (also self-registered at runtime
    // by AsOfJoinNative.backward for DataFrame-API callers)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
