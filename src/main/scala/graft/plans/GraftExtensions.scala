package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point — the deployment-grade way to
  * ship the engine's Catalyst additions into ANY session:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * Currently registers the native SQL functions (highlight_context);
  * planner strategies/rules would be injected here too if an operator
  * ever needs them (the reference's surface doesn't — SURVEY §4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("highlight_context"),
      new ExpressionInfo(classOf[HighlightContext].getName, "highlight_context"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HighlightContext.fromExpressions(exprs)))
  }
}
