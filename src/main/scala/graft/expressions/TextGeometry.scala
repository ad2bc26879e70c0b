package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers for the text-geometry expressions below; top-level
  * object so generated Java calls plain static methods. All loops are
  * per-code-point to match the indexing of Spark's `split(s, "")`
  * (which never splits surrogate pairs), so these are drop-in
  * replacements for the higher-order-function formulations they
  * retire — byte-identical output, but inside whole-stage codegen
  * instead of interpreted per row. */
object TextGeometryUtil {

  private val HyphenCps: Array[Int] = "-‐‑‒–—―".map(_.toInt).toArray

  private def isHyphen(cp: Int): Boolean = {
    var i = 0
    while (i < HyphenCps.length) { if (HyphenCps(i) == cp) return true; i += 1 }
    false
  }

  /** Java regex `\s` on a single char — what the retired
    * `rlike("^\\s$")` per-char test matched. */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** `normalize_text_with_offsets` (reference: extraction/
    * normalization.py:191) in one pass: fold each character (hyphen
    * variants -> space, soft hyphen -> deleted, else de-accent +
    * lowercase) and record, per emitted folded character, the
    * code-point index of its originating character. */
  def foldWithOffsets(s: UTF8String): InternalRow = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var offs = new Array[Int](math.max(str.length, 8))
    var m = 0
    var i = 0
    var cpIdx = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (m + 2 >= offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
      if (isHyphen(cp)) { sb.append(' '); offs(m) = cpIdx; m += 1 }
      else if (cp == 0xAD) { /* soft hyphen: deleted */ }
      else if (cp < 0x80) {
        sb.append((if (cp >= 'A' && cp <= 'Z') cp + 32 else cp).toChar)
        offs(m) = cpIdx; m += 1
      } else {
        // per-char NFKD-strip then lowercase, exactly lower(stripAccents(ch));
        // a char may fold to 0..n chars (e.g. ligature expansion)
        val folded = StripAccentsUtil
          .strip(UTF8String.fromString(new String(Character.toChars(cp))))
          .toLowerCase.toString
        var j = 0
        while (j < folded.length) {
          val fcp = folded.codePointAt(j)
          if (m >= offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
          sb.appendCodePoint(fcp)
          offs(m) = cpIdx; m += 1
          j += Character.charCount(fcp)
        }
      }
      i += Character.charCount(cp)
      cpIdx += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString),
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(offs, m))))
  }

  /** Code-point positions where a token starts in already-folded text:
    * a non-whitespace char whose predecessor is whitespace or the text
    * edge. Byte-identical to the retired filter(sequence)/rlike chain,
    * including its quirk: `split("", "")` yields [""], whose lone
    * empty element reads as non-whitespace, so the empty string gets
    * a phantom start at 0 — downstream never reads it (no variant
    * matches the empty gram), but parity keeps the differential spec
    * exact. */
  def tokenCharStarts(s: UTF8String): ArrayData = {
    val str = s.toString
    var offs = new Array[Int](16)
    var m = 0
    var i = 0
    var cpIdx = 0
    var prevWs = true
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val ws = isWs(cp)
      if (!ws && prevWs) {
        if (m == offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
        offs(m) = cpIdx; m += 1
      }
      prevWs = ws
      i += Character.charCount(cp)
      cpIdx += 1
    }
    if (str.isEmpty) { offs(0) = 0; m = 1 } // phantom start on [""]
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(offs, m))
  }

  /** Prefix char offsets of each token in `concat_ws(" ", toks)`:
    * n + 1 entries, starts(0) = 0, starts(i+1) = starts(i) +
    * numChars(tok_i) + 1. */
  def prefixStarts(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n + 1)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += toks.getUTF8String(i).numChars() + 1L
      out(i + 1) = acc
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Char intervals [s, e) of the tokens that are members of `words`,
    * under the same space-joined geometry as `prefixStarts`. */
  def adminIntervals(toks: ArrayData, words: java.util.HashSet[UTF8String]): ArrayData = {
    val n = toks.numElements()
    val buf = new java.util.ArrayList[AnyRef](4)
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val len = t.numChars().toLong
      if (words.contains(t))
        buf.add(new GenericInternalRow(Array[Any](acc, acc + len)))
      acc += len + 1L
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  private val Space = UTF8String.fromString(" ")

  /** Space-joined n-token shingles; empty when fewer than n tokens. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of tokens present in `words`. */
  def countMembers(toks: ArrayData, words: java.util.HashSet[UTF8String]): Long = {
    val m = toks.numElements()
    var c = 0L
    var i = 0
    while (i < m) { if (words.contains(toks.getUTF8String(i))) c += 1; i += 1 }
    c
  }

  /** exists interval [s, e] with s >= lo && e <= hi. */
  def anyWithin(intervals: ArrayData, lo: Long, hi: Long): Boolean = {
    val n = intervals.numElements()
    var i = 0
    while (i < n) {
      val r = intervals.getStruct(i, 2)
      if (r.getLong(0) >= lo && r.getLong(1) <= hi) return true
      i += 1
    }
    false
  }
}

/** struct(folded, offsets) — native form of
  * TextFunctions.foldWithOffsets' per-char transform/zip_with/flatten
  * chain (all CodegenFallback-interpreted); feeds q59/q61 and the span
  * projection chain. */
case class FoldWithOffsets(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("folded", StringType, nullable = false),
    StructField("offsets", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_fold_with_offsets"

  override def nullSafeEval(input: Any): Any =
    TextGeometryUtil.foldWithOffsets(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextGeometryUtil.foldWithOffsets($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldWithOffsets =
    copy(child = newChild)
}

/** Token-start char positions in folded text — native form of the
  * filter(sequence)(per-char rlike) chain in Gazetteer.matchSpans. */
case class TokenCharStarts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_token_char_starts"

  override def nullSafeEval(input: Any): Any =
    TextGeometryUtil.tokenCharStarts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextGeometryUtil.tokenCharStarts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCharStarts =
    copy(child = newChild)
}

/** Prefix char offsets of tokens under space-joined geometry — native
  * form of the O(n^2) aggregate/concat fold in Gazetteer.matches. */
case class TokenPrefixStarts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_prefix_starts"

  override def nullSafeEval(input: Any): Any =
    TextGeometryUtil.prefixStarts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextGeometryUtil.prefixStarts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenPrefixStarts =
    copy(child = newChild)
}

/** Char intervals of admin-word tokens — native form of the
  * filter(zip_with(...)) chain in Gazetteer.matches. The word set is
  * a constructor constant shipped as a codegen reference object. */
case class AdminIntervals(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", LongType, nullable = false),
      StructField("e", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_admin_intervals"

  @transient private lazy val jWords: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextGeometryUtil.adminIntervals(input.asInstanceOf[ArrayData], jWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("adminWords", jWords, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextGeometryUtil.adminIntervals($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): AdminIntervals =
    copy(child = newChild)
}

/** exists interval within [lo, hi] — native form of the per-candidate
  * `exists()` admin-adjacency test; this one runs per exploded gram
  * row, the hottest spot of q15/q16. */
case class IntervalAdjacent(intervals: Expression, lo: Expression, hi: Expression)
    extends TernaryExpression {
  override def first: Expression = intervals
  override def second: Expression = lo
  override def third: Expression = hi
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_interval_adjacent"

  override def nullSafeEval(arr: Any, l: Any, h: Any): Any =
    TextGeometryUtil.anyWithin(arr.asInstanceOf[ArrayData],
      l.asInstanceOf[Long], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, l, h) => s"graft.expressions.TextGeometryUtil.anyWithin($a, $l, $h)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): IntervalAdjacent =
    copy(intervals = newFirst, lo = newSecond, hi = newThird)
}

/** Space-joined n-token shingles anchored at each position — native
  * form of the transform/concat_ws lambda under the whole dedup
  * family's corpus scans. Fewer than n tokens yields an empty array
  * (explode_outer then emits one null row, dropped by the caller's
  * filter, exactly like the retired when()/null guard). */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_shingles"

  override def nullSafeEval(input: Any): Any =
    TextGeometryUtil.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextGeometryUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

/** Count of tokens that are members of `words` — native form of the
  * size(filter(toks, isin)) stop-word counter. */
case class CountMembers(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_members"

  @transient private lazy val jWords: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextGeometryUtil.countMembers(input.asInstanceOf[ArrayData], jWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("words", jWords, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextGeometryUtil.countMembers($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountMembers =
    copy(child = newChild)
}
