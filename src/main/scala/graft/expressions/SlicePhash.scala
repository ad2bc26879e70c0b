package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

object SlicePhashUtil {
  val NSlices = 16

  /** Perceptual-hash stub over a string payload: split the code-point
    * sequence into 16 equal slices, sum each slice's code points, set
    * bit j iff slice j is strictly above the per-slice mean. The
    * "decode" is a stand-in (real pHash runs on pixel blocks — the
    * image libs aren't in this container), but the locality property
    * the downstream banding join needs is real: a small local edit
    * perturbs one slice sum, flipping at most a few bits.
    *
    * One pass, zero allocations — engine-identical to the DuckDB
    * formulation (slice of 0-based index i = i*16/len over
    * `string_split(text,'')` characters, sums compared as
    * `s*16 > total`). */
  def phash(s: UTF8String): Long = {
    val str = s.toString
    val sums = new Array[Long](NSlices)
    // count code points first: slice indexing is over code points,
    // matching DuckDB's string_split(text,'') element indexing
    val len = str.codePointCount(0, str.length)
    if (len == 0) return 0L
    var i = 0
    var cpIdx = 0L
    var total = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sums(((cpIdx * NSlices) / len).toInt) += cp
      total += cp
      i += Character.charCount(cp)
      cpIdx += 1
    }
    var h = 0L
    var j = 0
    while (j < NSlices) {
      if (sums(j) * NSlices > total) h |= (1L << j)
      j += 1
    }
    h
  }
}

/** 16-slice perceptual-hash stub as a native codegen'd expression — the
  * multimodal near-dup candidate key (reference treats assets as opaque
  * payloads; see MultimodalQueries). */
case class SlicePhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_slice_phash"

  override def nullSafeEval(input: Any): Any =
    SlicePhashUtil.phash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SlicePhashUtil.phash($c)")

  override protected def withNewChildInternal(newChild: Expression): SlicePhash =
    copy(child = newChild)
}
