package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking as ONE native pass (q181): the rolling
  * polynomial hash, boundary test and chunk substring split run in a
  * single per-row loop — the HOF form (char-split `transform` +
  * `filter` over a position `sequence`) is CodegenFallback and
  * interprets ~10 ops per character of every document. Semantics are
  * byte-identical to that fold (same window/pows/mod/divisor math on
  * the same code points); the differential spec pins it.
  */
object CdcChunksUtil {
  def chunks(s: UTF8String, w: Int, pows: Array[Long], mod: Long,
      divisor: Long): ArrayData = {
    val str = s.toString
    val len = str.length
    val cuts = new java.util.ArrayList[Integer]()
    cuts.add(0)
    var i = w
    while (i < len) {
      var h = 0L
      var j = 0
      while (j < w) { h += str.charAt(i - 1 - j).toLong * pows(j); j += 1 }
      if (h % mod % divisor == 0) cuts.add(i)
      i += 1
    }
    cuts.add(len)
    val out = new Array[Any](cuts.size() - 1)
    var k = 0
    while (k < cuts.size() - 1) {
      out(k) = UTF8String.fromString(str.substring(cuts.get(k), cuts.get(k + 1)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class CdcChunks(child: Expression, window: Int, pows: Seq[Long],
    mod: Long, divisor: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  @transient private lazy val powArr: Array[Long] = pows.toArray

  override def nullSafeEval(input: Any): Any =
    CdcChunksUtil.chunks(input.asInstanceOf[UTF8String], window, powArr, mod, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val powsRef = ctx.addReferenceObj("pows", powArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CdcChunksUtil.chunks($c, $window, $powsRef, ${mod}L, ${divisor}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
