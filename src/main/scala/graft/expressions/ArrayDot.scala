package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

object ArrayDotUtil {
  /** Sequential left-to-right sum of per-element double products over
    * two float arrays — the identical op sequence as DuckDB's
    * `list_reduce(list_transform(range .. CAST AS DOUBLE * ..))`, so
    * results are bit-reproducible cross-engine. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** Dot product of two `array<float>` columns as a native codegen'd
  * expression — the hot inner loop of every similarity/ANN operator.
  * The higher-order-function formulation (zip_with + aggregate) is
  * interpreted per element with boxing; this is a tight primitive loop
  * inside whole-stage codegen, with the exact same fold order (results
  * stay bit-identical to the HOF version and the DuckDB oracle).
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.ArrayDotUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
