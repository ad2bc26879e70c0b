package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd micro-int vector primitives — the per-vector inner
  * loops of the ANN family. The retired higher-order-function forms
  * (`transform`/`zip_with`/`aggregate`) are CodegenFallback:
  * interpreted per ELEMENT with boxing, on every corpus vector of
  * every quantizer/search query. Each expression preserves the HOF
  * form's exact arithmetic (same rounding, same left-to-right integer
  * fold — associative, so bit-identical) so oracle hashes are
  * unchanged; a differential spec pins parity. */
object VectorPrimitivesUtil {

  /** round(x * 1e6) per element with Spark's Round semantics
    * (BigDecimal HALF_UP — NOT Math.round, which differs on negative
    * halves). */
  def microVec(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.math.BigDecimal.valueOf(a.getFloat(i).toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def requireSameLen(a: ArrayData, b: ArrayData): Unit =
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"vector length mismatch: ${a.numElements()} vs ${b.numElements()}")

  def sqDist(a: ArrayData, b: ArrayData): Long = {
    requireSameLen(a, b)
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
    s
  }

  def longDot(a: ArrayData, b: ArrayData): Long = {
    requireSameLen(a, b)
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  def sumSq(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { val x = a.getLong(i); s += x * x; i += 1 }
    s
  }

  def sq8(e: ArrayData, mns: ArrayData, mxs: ArrayData): ArrayData = {
    val n = e.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = e.getFloat(i).toDouble
      val mn = mns.getDouble(i)
      val mx = mxs.getDouble(i)
      val code =
        if (mx > mn)
          java.math.BigDecimal.valueOf((x - mn) * 255.0 / (mx - mn))
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        else 128L
      out(i) = math.max(0L, math.min(255L, code))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def pqSlices(m: ArrayData, blocks: Int, sub: Int): ArrayData = {
    val out = new Array[Any](blocks)
    var b = 0
    while (b < blocks) {
      val s = new Array[Long](sub)
      var j = 0
      while (j < sub) { s(j) = m.getLong(b * sub + j); j += 1 }
      out(b) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b, UnsafeArrayData.fromPrimitiveArray(s)))
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def subVec(a: ArrayData, b: ArrayData): ArrayData = {
    requireSameLen(a, b)
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = a.getLong(i) - b.getLong(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** array<float> -> array<long> micro-int embedding. */
case class MicroVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_micro_vec"
  override def nullSafeEval(a: Any): Any =
    VectorPrimitivesUtil.microVec(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.VectorPrimitivesUtil.microVec($c)")
  override protected def withNewChildInternal(newChild: Expression): MicroVec =
    copy(child = newChild)
}

/** Exact integer squared L2 between micro-int vectors. */
case class LongSqDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sq_dist"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorPrimitivesUtil.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorPrimitivesUtil.sqDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongSqDist =
    copy(left = l, right = r)
}

/** Exact integer dot of micro-int vectors. */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_long_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorPrimitivesUtil.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorPrimitivesUtil.longDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot =
    copy(left = l, right = r)
}

/** Exact integer sum of squares of a micro-int vector. */
case class LongSumSq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sum_sq"
  override def nullSafeEval(a: Any): Any =
    VectorPrimitivesUtil.sumSq(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.VectorPrimitivesUtil.sumSq($c)")
  override protected def withNewChildInternal(newChild: Expression): LongSumSq =
    copy(child = newChild)
}

/** Elementwise difference of micro-int vectors (PQ residuals). */
case class LongSubVec(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sub_vec"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorPrimitivesUtil.subVec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorPrimitivesUtil.subVec($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongSubVec =
    copy(left = l, right = r)
}

/** SQ8 affine quantizer: code[i] = clamp(0, 255, round((x[i] - mn[i])
  * * 255 / (mx[i] - mn[i]))), 128 where the range is degenerate —
  * byte-identical to the retired per-element transform lambda
  * (same op order, Spark Round = BigDecimal HALF_UP). */
case class Sq8Encode(emb: Expression, mns: Expression, mxs: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = emb
  override def second: Expression = mns
  override def third: Expression = mxs
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sq8_encode"
  override def nullSafeEval(e: Any, a: Any, b: Any): Any =
    VectorPrimitivesUtil.sq8(e.asInstanceOf[ArrayData],
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (e, a, b) => s"graft.expressions.VectorPrimitivesUtil.sq8($e, $a, $b)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8Encode =
    copy(emb = f, mns = s, mxs = t)
}

/** PQ subvector slicing: array<struct<block, sub>> with `blocks`
  * entries of `sub` longs each — the retired transform+slice lambda. */
case class PqSlices(child: Expression, blocks: Int, sub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("block",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("sub",
        ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pq_slices"
  override def nullSafeEval(a: Any): Any =
    VectorPrimitivesUtil.pqSlices(a.asInstanceOf[ArrayData], blocks, sub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorPrimitivesUtil.pqSlices($c, $blocks, $sub)")
  override protected def withNewChildInternal(newChild: Expression): PqSlices =
    copy(child = newChild)
}
