package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric array columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)`
  * — a sequential left fold in double, so results are bit-compatible
  * with the higher-order-function formulation AND with engines that
  * fold sequentially (the DuckDB oracle's list_reduce). The point of
  * the native expression is performance: array lambdas are interpreted
  * per element (and excluded from whole-stage codegen); this compiles
  * to a tight primitive loop — measured ~5x on the LSH bucket
  * computation (8 projections x 64 dims per row at sf0.1).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"dot_product requires array inputs, got ${other.catalogString}")
  }

  // A null ELEMENT makes the whole result null (matching the
  // zip_with/aggregate formulation, where a null product poisons the
  // fold); mismatched lengths fold over the common prefix.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires numeric arrays, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def get(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    acc
  }

  private def accessor(et: DataType, v: String, i: String): String = et match {
    case FloatType => s"(double) $v.getFloat($i)"
    case DoubleType => s"$v.getDouble($i)"
    case IntegerType => s"(double) $v.getInt($i)"
    case LongType => s"(double) $v.getLong($i)"
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          $acc += ${accessor(ta, a, i)} * ${accessor(tb, b, i)};
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Codegen'd squared-L2 distance over two numeric array columns.
  *
  * For equal-length inputs, semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> (double(x) - double(y))^2), 0.0, +)`
  * — a sequential left fold in double, bit-compatible with the HOF
  * formulation and the DuckDB oracle's grouped sum over dimensions
  * (within the repo-wide 1e-6 quantization). On MISMATCHED lengths the
  * fold covers the common prefix, where the zip_with formulation would
  * return null (see the nullability note below). The motivation is the
  * same as [[DotProduct]]'s: array lambdas are interpreted per
  * element, and the PQ encode path evaluates |codes| x |subspaces|
  * distances per row — measured 3.5 s for 5000 rows at sf0.1 under
  * the lambda formulation.
  */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2sq"
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"l2sq requires array inputs, got ${other.catalogString}")
  }

  // A null ELEMENT makes the whole result null (matching the
  // zip_with/aggregate formulation, where a null square poisons the
  // fold); mismatched lengths fold over the COMMON PREFIX — here the
  // two formulations diverge (zip_with null-pads the shorter side and
  // returns null). Callers pair equal-dimension vectors by contract;
  // same behavior as [[DotProduct]].
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2sq requires numeric arrays, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def get(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = get(a, i, ta) - get(b, i, tb)
      acc += d * d
      i += 1
    }
    acc
  }

  private def accessor(et: DataType, v: String, i: String): String = et match {
    case FloatType => s"(double) $v.getFloat($i)"
    case DoubleType => s"$v.getDouble($i)"
    case IntegerType => s"(double) $v.getInt($i)"
    case LongType => s"(double) $v.getLong($i)"
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          double $d = ${accessor(ta, a, i)} - ${accessor(tb, b, i)};
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq =
    copy(left = l, right = r)
}

object vector {
  def dotProduct(a: Column, b: Column): Column =
    shims.column(DotProduct(shims.expression(a), shims.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    shims.column(L2Sq(shims.expression(a), shims.expression(b)))
}
