package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{Gunzip, Gzip}

/** Catalyst optimizer rule: eliminate codec round-trips.
  *
  *   gunzip(gzip(x))          => x
  *   gzip(gunzip(x))          -- NOT rewritten: gzip output is not
  *                               canonical (header flags/mtime), so
  *                               the bytes are not guaranteed equal.
  *
  * Strict-mode gunzip(gzip(x)) is an identity on any input; the
  * lenient variant is also safe (gzip output always gunzips). The rule
  * runs in the operator-optimization batch via injectOptimizerRule.
  */
object EliminateCodecRoundTrip extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Gunzip(Gzip(child), _) => child
    }
}

/** SparkSessionExtensions entry point: registers the codec functions
  * for SQL and the round-trip elimination rule. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => EliminateCodecRoundTrip)
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("gzip"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[Gzip].getName, "gzip"),
        (children: Seq[Expression]) => Gzip(children.head)))
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("gunzip"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[Gunzip].getName, "gunzip"),
        (children: Seq[Expression]) => Gunzip(children.head)))
  }
}
