package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All non-overlapping matches of a regex over a string, with spans —
  * the `finditer` semantics of the reference's deterministic city
  * patterns (gazetteer.py:98 `find_city_pattern_matches`). Spark's
  * builtin regexp functions return match values only; the reference's
  * span-based de-duplication (service.py:138 `seen_spans`) needs the
  * positions, so this runs the compiled matcher once per row and emits
  * `array<struct<m, g, m_start, m_end, g_start, g_end>>`:
  * the full match, capture group `group`, and both spans.
  *
  * Offsets are CODE POINTS (what Python `match.span()` and DuckDB's
  * char-based `strpos` count), not UTF-16 units, so spans stay
  * engine-portable beyond the BMP. The pattern is a plan-time literal:
  * compiled once per operator instance, not per row.
  */
case class RegexSpans(child: Expression, pattern: String, group: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = RegexSpans.Schema
  override def prettyName: String = "graft_regex_spans"

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    val m = compiled.matcher(str)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // UTF-16 index -> code-point index, amortized O(1) per match
    // because matches arrive in increasing-offset order.
    var lastU16 = 0
    var lastCp = 0
    def cp(u16: Int): Int = {
      if (u16 < lastU16) { lastU16 = 0; lastCp = 0 }
      lastCp += str.codePointCount(lastU16, u16)
      lastU16 = u16
      lastCp
    }
    while (m.find()) {
      val g = m.group(group)
      out += InternalRow(
        UTF8String.fromString(m.group(0)),
        if (g == null) null else UTF8String.fromString(g),
        cp(m.start()), cp(m.end()),
        if (g == null) -1 else cp(m.start(group)),
        if (g == null) -1 else cp(m.end(group)))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): RegexSpans =
    copy(child = newChild)
}

object RegexSpans {
  val Schema: DataType = ArrayType(
    StructType(Seq(
      StructField("m", StringType),
      StructField("g", StringType),
      StructField("m_start", IntegerType),
      StructField("m_end", IntegerType),
      StructField("g_start", IntegerType),
      StructField("g_end", IntegerType))),
    containsNull = false)
}
