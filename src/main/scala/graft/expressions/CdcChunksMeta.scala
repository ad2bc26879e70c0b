package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** [[CdcChunks]] with the cut RESIDUE carried per chunk — the device
  * behind the q254 chunk-geometry sweep: power-of-two divisors NEST
  * (h % m % 2d == 0 implies h % m % d == 0), so chunking ONCE at the
  * finest divisor and keeping each cut's `h % mod` lets every coarser
  * arm rebuild its exact chunking by merging fine chunks at cuts
  * whose residue fails its divisor — one native pass over the corpus
  * text for the whole sweep, instead of one pass per arm. Each
  * element is (chunk, r): `r` is the rolling-hash residue of the cut
  * STARTING the chunk, -1 for the document head (no cut starts it).
  * Same loop and math as [[CdcChunks]]; the differential spec pins
  * that dropping `r` reproduces CdcChunks at the same divisor and
  * that per-divisor reconstruction equals direct chunking. */
object CdcChunksMetaUtil {
  def chunks(s: UTF8String, w: Int, pows: Array[Long], mod: Long,
      divisor: Long): ArrayData = {
    val str = s.toString
    val len = str.length
    val cuts = new java.util.ArrayList[Integer]()
    val res = new java.util.ArrayList[java.lang.Long]()
    cuts.add(0)
    res.add(-1L)
    var i = w
    while (i < len) {
      var h = 0L
      var j = 0
      while (j < w) { h += str.charAt(i - 1 - j).toLong * pows(j); j += 1 }
      val r = h % mod
      if (r % divisor == 0) { cuts.add(i); res.add(r) }
      i += 1
    }
    cuts.add(len)
    val out = new Array[Any](cuts.size() - 1)
    var k = 0
    while (k < cuts.size() - 1) {
      out(k) = InternalRow(
        UTF8String.fromString(str.substring(cuts.get(k), cuts.get(k + 1))),
        res.get(k).longValue())
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class CdcChunksMeta(child: Expression, window: Int, pows: Seq[Long],
    mod: Long, divisor: Long) extends UnaryExpression {
  override def dataType: DataType = CdcChunksMeta.Schema
  override def prettyName: String = "graft_cdc_chunks_meta"

  @transient private lazy val powArr: Array[Long] = pows.toArray

  override def nullSafeEval(input: Any): Any =
    CdcChunksMetaUtil.chunks(input.asInstanceOf[UTF8String], window, powArr, mod, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val powsRef = ctx.addReferenceObj("pows", powArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CdcChunksMetaUtil.chunks($c, $window, $powsRef, ${mod}L, ${divisor}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunksMeta =
    copy(child = newChild)
}

object CdcChunksMeta {
  val Schema: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk", StringType),
      StructField("r", LongType))),
    containsNull = false)
}
