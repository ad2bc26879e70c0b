package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

object PolyHashUtil {
  val Mod = 1000000007L
  val Base = 31L

  /** Left fold over Unicode code points — exactly what DuckDB computes
    * for `list_reduce(list_transform(string_split(s,''), ascii), ...)`,
    * so oracle-compared hash values stay engine-identical. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** Portable polynomial string hash as a native codegen'd expression.
  * Replaces the interpreted higher-order-function formulation (split +
  * transform + aggregate allocated per-char arrays); this is the hot
  * inner loop of minhash/simhash/fingerprinting, so it must stay in
  * whole-stage codegen with zero allocations.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHashUtil.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PolyHashUtil.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
