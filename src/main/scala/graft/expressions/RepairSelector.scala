package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object RepairSelectorUtil {
  /** The scraper's malformed-CSS-selector auto-repair
    * (reference: scraper.py:522-554 `_normalize_selector_query`) as one
    * left-to-right pass: open-quote state + bracket balance; an
    * unclosed quote closes before a following `]` (else at the end),
    * and missing `]`s are appended — capped at 16, matching the
    * retired column fold's `"]]..."(16).substr(1, bal)` literal. */
  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 4)
    var bal = 0
    var q = 0 // open-quote code point, 0 = none
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val isQuote = cp == '\'' || cp == '"'
      // quote state updates FIRST (scraper.py:530-534), then the
      // bracket logic sees the updated state
      var q1 = if (isQuote && q == 0) cp else if (isQuote && q == cp) 0 else q
      if (cp == '[' && q1 == 0) bal += 1
      else if (cp == ']' && bal > 0) bal -= 1
      // a `]` inside an open quote closes the quote first
      if (cp == ']' && q1 != 0) { sb.appendCodePoint(q1); sb.appendCodePoint(cp) }
      else sb.appendCodePoint(cp)
      if (cp == ']') q1 = 0
      q = q1
      i += Character.charCount(cp)
    }
    if (q != 0) sb.appendCodePoint(q)
    var k = math.min(math.max(bal, 0), 16)
    while (k > 0) { sb.append(']'); k -= 1 }
    UTF8String.fromString(sb.toString)
  }
}

/** Malformed-selector repair as a native codegen'd expression,
  * replacing the interpreted per-char `aggregate()` struct fold that
  * made q92 a bench hotspot on a map-only query. */
case class RepairSelector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_repair_selector"

  override def nullSafeEval(input: Any): Any =
    RepairSelectorUtil.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RepairSelectorUtil.repair($c)")

  override protected def withNewChildInternal(newChild: Expression): RepairSelector =
    copy(child = newChild)
}
