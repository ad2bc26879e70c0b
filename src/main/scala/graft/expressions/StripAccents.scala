package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so generated code can call a plain static method. */
object StripAccentsUtil {
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s // fast path: nothing to normalize, zero-copy
    val n = Normalizer.normalize(str, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(n.length)
    i = 0
    while (i < n.length) {
      val ch = n.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Accent-folding as a native Catalyst expression (NFKD + drop
  * non-spacing marks), the Spark-side equivalent of the reference's
  * `_strip_accents` / `_normalize_char_for_matching`
  * (reference: sentinela/extraction/normalization.py:141,171).
  *
  * A native expression (not a UDF) so it participates in whole-stage
  * codegen and constant folding; the ASCII fast path makes it nearly
  * free on mostly-ASCII corpora.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override def nullSafeEval(input: Any): Any =
    StripAccentsUtil.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StripAccentsUtil.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
