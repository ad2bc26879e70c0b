package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object StreamSignalsUtil {

  /** One linear pass over a document's token array computing every
    * per-token signal the context-gazetteer chain needs — the native
    * replacement for FOUR window functions over the exploded corpus
    * stream (sentence-prefix sums for sent_id and tok_start, the
    * +-48-char RANGE frame for the first admin occurrence, and the
    * per-(doc, sentence) min state-UF) plus the lead() gram builder.
    * Per token i (space-joined char geometry):
    *
    *  - sent_id: count of sentence-break tokens strictly before i;
    *  - tok_start: char offset in concat_ws(" ", toks);
    *  - fa_s / fa_e: char span of the FIRST admin-word occurrence with
    *    start >= tok_start - windowChars (null when none) — a
    *    two-pointer walk, exactly the old RANGE-frame min;
    *  - ctx_uf: binary-min UF among the state words of token i's
    *    sentence (null when the sentence mentions none);
    *  - grams: the 1..maxN-token grams anchored at i (null past the
    *    array end), replacing the lead() lookahead columns;
    *  - sentence (only when emitSentence): the space-joined folded
    *    token stream of token i's sentence, terminator included — the
    *    occurrence-sentence view's full-frame collect_list window,
    *    built once per sentence and shared by reference across its
    *    tokens.
    */
  def signals(toks: ArrayData, breakTok: UTF8String,
      admin: java.util.HashSet[UTF8String],
      states: java.util.HashMap[UTF8String, UTF8String],
      windowChars: Long, maxN: Int, emitSentence: Boolean): ArrayData = {
    val n = toks.numElements()
    val tok = new Array[UTF8String](n)
    var i = 0
    while (i < n) { tok(i) = toks.getUTF8String(i); i += 1 }

    // pass 1: starts, sentence ids, admin occurrences, per-sentence UF
    val starts = new Array[Long](n)
    val sent = new Array[Int](n)
    var aS = new Array[Long](4)
    var aE = new Array[Long](4)
    var nA = 0
    var breaks = 0
    var acc = 0L
    i = 0
    while (i < n) {
      starts(i) = acc
      sent(i) = breaks
      val len = tok(i).numChars().toLong
      if (admin.contains(tok(i))) {
        if (nA == aS.length) {
          aS = java.util.Arrays.copyOf(aS, nA * 2)
          aE = java.util.Arrays.copyOf(aE, nA * 2)
        }
        aS(nA) = acc; aE(nA) = acc + len; nA += 1
      }
      if (tok(i).equals(breakTok)) breaks += 1
      acc += len + 1L
      i += 1
    }
    val sentUf = new Array[UTF8String](breaks + 1)
    i = 0
    while (i < n) {
      val uf = states.get(tok(i))
      if (uf != null) {
        val s = sent(i)
        if (sentUf(s) == null || uf.compareTo(sentUf(s)) < 0) sentUf(s) = uf
      }
      i += 1
    }
    val sentTxt: Array[UTF8String] =
      if (!emitSentence) null
      else {
        val sbs = new Array[java.lang.StringBuilder](breaks + 1)
        i = 0
        while (i < n) {
          val s = sent(i)
          if (sbs(s) == null) sbs(s) = new java.lang.StringBuilder(32)
          else sbs(s).append(' ')
          sbs(s).append(tok(i).toString)
          i += 1
        }
        sbs.map(sb => if (sb == null) null else UTF8String.fromString(sb.toString))
      }

    // pass 2: emit per-token rows; the admin pointer only advances
    val out = new Array[Any](n)
    var p = 0
    i = 0
    while (i < n) {
      while (p < nA && aS(p) < starts(i) - windowChars) p += 1
      val grams = new Array[Any](maxN)
      var k = 0
      while (k < maxN) {
        if (i + k < n) {
          if (k == 0) grams(0) = tok(i)
          else {
            val sb = new java.lang.StringBuilder(grams(k - 1).toString)
            sb.append(' ').append(tok(i + k).toString)
            grams(k) = UTF8String.fromString(sb.toString)
          }
        }
        k += 1
      }
      out(i) = new GenericInternalRow(Array[Any](
        sent(i).toLong, starts(i),
        if (p < nA) aS(p) else null,
        if (p < nA) aE(p) else null,
        sentUf(sent(i)),
        new GenericArrayData(grams),
        if (sentTxt == null) null else sentTxt(sent(i))))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-token context-gazetteer signals as one native codegen'd pass —
  * retires the exploded-stream window chain (2 prefix sums, a RANGE
  * frame, a per-sentence min, and maxN lead() columns) that made
  * q56/q57 the heaviest remaining text queries: the signals now
  * compute map-side inside the scan stage, and the only shuffle left
  * in the chain is the per-(doc, keyword) aggregation itself. */
case class StreamSignals(child: Expression, breakToken: String,
    adminWords: Seq[String], stateUf: Seq[(String, String)],
    windowChars: Long, maxN: Int, emitSentence: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sent_id", LongType, nullable = false),
      StructField("tok_start", LongType, nullable = false),
      StructField("fa_s", LongType, nullable = true),
      StructField("fa_e", LongType, nullable = true),
      StructField("ctx_uf", StringType, nullable = true),
      StructField("grams", ArrayType(StringType, containsNull = true), nullable = false),
      StructField("sentence", StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "graft_stream_signals"

  @transient private lazy val jBreak: UTF8String = UTF8String.fromString(breakToken)
  @transient private lazy val jAdmin: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    adminWords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  @transient private lazy val jStates: java.util.HashMap[UTF8String, UTF8String] = {
    val m = new java.util.HashMap[UTF8String, UTF8String]()
    stateUf.foreach { case (w, uf) =>
      m.put(UTF8String.fromString(w), UTF8String.fromString(uf))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    StreamSignalsUtil.signals(input.asInstanceOf[ArrayData],
      jBreak, jAdmin, jStates, windowChars, maxN, emitSentence)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val breakRef = ctx.addReferenceObj("breakTok", jBreak,
      "org.apache.spark.unsafe.types.UTF8String")
    val adminRef = ctx.addReferenceObj("adminWords", jAdmin, "java.util.HashSet")
    val statesRef = ctx.addReferenceObj("stateUf", jStates, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.StreamSignalsUtil.signals($c, $breakRef, $adminRef, $statesRef, ${windowChars}L, $maxN, $emitSentence)")
  }

  override protected def withNewChildInternal(newChild: Expression): StreamSignals =
    copy(child = newChild)
}
