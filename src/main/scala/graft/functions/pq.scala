package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Product-quantization encode as ONE native evaluation.
  *
  * The composed formulation (per subspace: `aggregate` fold over a
  * filtered codebook array, `slice` per subspace, struct accumulator
  * per step) is semantically right but runs ~120 interpreted lambda
  * steps per row — measured 3.5 s for 5000 rows at sf0.1, the bench's
  * #2 hotspot. This expression computes the identical codes in one
  * tight JVM loop per row.
  *
  * Semantics replicated EXACTLY from the fold (same oracle hashes):
  * entries are scanned in the array's (subspace asc, code asc) order;
  * per entry the squared-L2 of the subspace slice is a sequential
  * left fold in double, quantized to the 1e-6 grid
  * (floor(d*1e6+0.5)/1e6) BEFORE comparison; a later entry wins only
  * on strictly smaller quantized distance, so ties keep the lowest
  * code. Null ELEMENTS inside vectors are not supported (whole-input
  * nulls propagate via nullIntolerant).
  */
object PqUtil {
  /** cbs: array of struct(subspace: Int, code: Int, subvec: numeric
    * array), sorted by (subspace, code). Returns array<int> of nSub
    * codes (-1 for a subspace with no codebook entries).
    */
  def encode(vec: ArrayData, cbs: ArrayData, nSub: Int, subDim: Int,
      vecFloat: Boolean, subFloat: Boolean): ArrayData = {
    val out = new Array[Any](nSub)
    val nEntries = cbs.numElements()
    var s = 0
    while (s < nSub) {
      val base = s * subDim
      var bestCode = -1
      var bestQd = Double.NaN
      var e = 0
      while (e < nEntries) {
        val row = cbs.getStruct(e, 3)
        if (row.getInt(0) == s) {
          val sub = row.getArray(2)
          val n = math.min(math.max(vec.numElements() - base, 0),
            math.min(subDim, sub.numElements()))
          var acc = 0.0
          var j = 0
          while (j < n) {
            val x = if (vecFloat) vec.getFloat(base + j).toDouble else vec.getDouble(base + j)
            val y = if (subFloat) sub.getFloat(j).toDouble else sub.getDouble(j)
            val d = x - y
            acc += d * d
            j += 1
          }
          val qd = math.floor(acc * 1e6 + 0.5) / 1e6
          if (bestCode < 0 || qd < bestQd) {
            bestCode = row.getInt(1)
            bestQd = qd
          }
        }
        e += 1
      }
      out(s) = bestCode
      s += 1
    }
    new GenericArrayData(out)
  }
}

case class PqEncodeCodes(left: Expression, right: Expression,
    nSub: Int, subDim: Int) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode_codes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def vecElem: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"vector must be array, got $other")
  }
  private def subElem: DataType = right.dataType match {
    case ArrayType(StructType(fields), _) => fields(2).dataType match {
      case ArrayType(et, _) => et
      case other => throw new IllegalArgumentException(s"subvec must be array, got $other")
    }
    case other => throw new IllegalArgumentException(s"codebooks must be array<struct>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(StructType(f), _) if f.length == 3 =>
        f(0).dataType == IntegerType && f(1).dataType == IntegerType &&
          (f(2).dataType match {
            case ArrayType(FloatType | DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vecOk && cbOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_encode_codes requires (array<float|double>, array<struct<int,int,array<float|double>>>), " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def vecFloat: Boolean = vecElem == FloatType
  private def subFloat: Boolean = subElem == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    PqUtil.encode(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      nSub, subDim, vecFloat, subFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqUtil.encode($v, $c, $nSub, $subDim, $vecFloat, $subFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeCodes =
    copy(left = l, right = r)
}

object pq {
  def encodeCodes(vec: Column, cbs: Column, nSub: Int, subDim: Int): Column =
    shims.column(PqEncodeCodes(shims.expression(vec), shims.expression(cbs), nSub, subDim))
}
