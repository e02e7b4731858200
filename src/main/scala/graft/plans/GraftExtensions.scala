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

/** SparkSessionExtensions entry point: registers the whole native
  * expression family for SQL text and the round-trip elimination
  * rule, so `spark.sql("SELECT dot_product(a, b), hash48(s),
  * word_shingles(t, 3) ...")` works anywhere the extension is
  * active. Activate with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => EliminateCodecRoundTrip)
    def inject(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      e.injectFunction(
        (new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(clazz.getName, name),
          builder))
    import graft.functions._
    inject("gzip", classOf[Gzip], c => Gzip(c.head))
    inject("gunzip", classOf[Gunzip], c => Gunzip(c.head))
    inject("base64_unchunked", classOf[Base64Unchunked], c => Base64Unchunked(c.head))
    inject("hash48", classOf[Hash48], c => Hash48(c.head))
    inject("dot_product", classOf[DotProduct], c => DotProduct(c(0), c(1)))
    inject("l2sq", classOf[L2Sq], c => L2Sq(c(0), c(1)))
    inject("word_shingles", classOf[WordShingles],
      c => WordShingles(c.head, intLit(c(1), "word_shingles n")))
    inject("char_shingles", classOf[CharShingles],
      c => CharShingles(c.head, intLit(c(1), "char_shingles n")))
    inject("double_order_bits", classOf[DoubleOrderBits],
      c => DoubleOrderBits(c.head, intLit(c(1), "double_order_bits shift")))
  }
}
