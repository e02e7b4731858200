package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle constructors.
  *
  * The higher-order-function formulation
  * `transform(sequence(1, size(split(text,' '))-2), i -> concat_ws(' ',
  * split(text,' ')[i-1], ...))` re-evaluates `split(text)` INSIDE the
  * lambda — CollapseProject inlines the bound array into every element
  * access, making shingle construction O(tokens^2) per document. These
  * expressions tokenize once and emit the shingle array in one pass;
  * outputs are string-identical to the lambda formulation (and to the
  * DuckDB oracle's list_transform over string_split / substr).
  */
object ShingleUtil {
  /** Word n-grams over single-space tokenization (Spark split
    * semantics: trailing empty tokens kept).
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Character n-grams (UTF-16 char positions, same as Spark substr
    * for BMP text).
    */
  def charShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    if (s.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](s.length - n + 1)
    var i = 0
    while (i <= s.length - n) {
      out(i) = UTF8String.fromString(s.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(out)
  }
}

abstract class ShingleExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  def n: Int
  protected def method: String
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.$method($c, $n)")
}

case class WordShingles(child: Expression, n: Int) extends ShingleExpression {
  override def prettyName: String = "word_shingles"
  override protected def method: String = "wordShingles"
  override def nullSafeEval(v: Any): Any =
    ShingleUtil.wordShingles(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

case class CharShingles(child: Expression, n: Int) extends ShingleExpression {
  override def prettyName: String = "char_shingles"
  override protected def method: String = "charShingles"
  override def nullSafeEval(v: Any): Any =
    ShingleUtil.charShingles(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(c: Expression): CharShingles = copy(child = c)
}

object shingles {
  def wordShingles(c: Column, n: Int): Column =
    shims.column(WordShingles(shims.expression(c), n))
  def charShingles(c: Column, n: Int): Column =
    shims.column(CharShingles(shims.expression(c), n))
}
