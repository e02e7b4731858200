package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graft.shims

/** Exact integer arithmetic helpers for the engine's micro-unit grids.
  *
  * Why this exists: Spark's `/` on long Columns is a DOUBLE divide.
  * The old idiom `((a - a%b)/b).cast("long")` makes the numerator an
  * exact multiple of b, but the quotient still round-trips through a
  * double, so once |quotient| exceeds 2^53 (~9e15 — i.e. a micro-unit
  * sum over ~9e9 whole units) bit-exactness is silently lost. At the
  * 100 TB scale this engine targets, per-bucket sums DO cross that
  * line, so every determinism claim built on the idiom was off by a
  * cliff.
  */
object intmath {

  /** Exact long division a div b — the Catalyst `IntegralDivide`
    * expression (SQL's `div` operator): pure long arithmetic, codegen
    * friendly, truncation toward zero exactly like the historical
    * `((a - a%b)/b)` idiom (Java long `/` and `%` both truncate), so
    * swapping it in is bit-compatible for every existing oracle while
    * staying exact past 2^53.
    */
  def ldiv(a: Column, b: Column): Column =
    shims.column(new IntegralDivide(
      shims.expression(a.cast("long")), shims.expression(b.cast("long")))).cast("long")
}
