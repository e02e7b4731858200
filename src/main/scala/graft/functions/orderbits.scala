package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving double -> long bucket key.
  *
  * `doubleToRawLongBits` is monotonic for non-negative doubles; for
  * negatives the bit pattern orders in reverse. The standard
  * total-order transform (flip the sign bit for non-negatives, flip
  * ALL bits for negatives) yields an unsigned-comparable long whose
  * order equals the IEEE double order. Right-shifting keeps the top
  * bits as a COARSE RANGE BUCKET: all values in a bucket are
  * contiguous in value order, and equal values always share a bucket.
  *
  * This is what lets [[graft.operators.Quantiles]] bucket a column
  * into range cells WITHOUT a min/max pre-pass (a full extra scan):
  * the bucket key is a pure per-row expression, so bucket counting is
  * a single map-side-combined aggregation straight off the scan.
  */
object DoubleOrderBitsUtil {
  def orderBits(v: Double, shift: Int): Long = {
    val b = java.lang.Double.doubleToRawLongBits(v)
    val total = if (b >= 0L) b ^ java.lang.Long.MIN_VALUE else ~b
    total >>> shift
  }
}

case class DoubleOrderBits(child: Expression, shift: Int) extends UnaryExpression {
  require(shift >= 0 && shift < 64, s"shift $shift out of [0, 64)")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "double_order_bits"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"double_order_bits requires double, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    DoubleOrderBitsUtil.orderBits(v.asInstanceOf[Double], shift)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DoubleOrderBitsUtil.orderBits($c, $shift)")
  override protected def withNewChildInternal(c: Expression): DoubleOrderBits = copy(child = c)
}

object orderbits {
  def doubleOrderBits(c: Column, shift: Int): Column =
    shims.column(DoubleOrderBits(shims.expression(c), shift))
}
