package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** One codebook: candidate ids + codewords, id-sorted. Top-level class
  * so generated Java can name it without inner-class mangling. */
final class ArgBook(val ids: Array[Long], val words: Array[Array[Long]])
  extends Serializable {
  require(ids.length == words.length && ids.nonEmpty, "empty codebook")
}

object ArgMinUtil {
  /** Exact integer-L2 argmin of `vec` over the book's codewords; ties
    * resolve to the first (lowest-id) candidate via strict <. The
    * tight primitive loop replaces a broadcast-join + min(struct)
    * aggregation (whose array-carrying buffer forces SortAggregate)
    * and the interpreted higher-order-function fold alike. */
  def argmin(vec: ArrayData, book: ArgBook): InternalRow = {
    val words = book.words
    val ids = book.ids
    // Fail loudly on a dimension mismatch rather than reading garbage
    // from UnsafeArrayData past the vector's end.
    if (vec.numElements() != words(0).length)
      throw new IllegalArgumentException(
        s"ArgMinCodebook: vector dim ${vec.numElements()} != codeword dim ${words(0).length}")
    var bestD = Long.MaxValue
    var bestId = -1L
    var c = 0
    while (c < words.length) {
      val w = words(c)
      var s = 0L
      var j = 0
      while (j < w.length) {
        val diff = vec.getLong(j) - w(j)
        s += diff * diff
        j += 1
      }
      if (s < bestD) { bestD = s; bestId = ids(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestId))
  }
}

/** Nearest-codeword assignment as a native codegen'd expression:
  * `vec` (array<bigint>) scores against the codebook selected by
  * `key` (bigint) and yields struct(d, cid) — the exact integer L2
  * distance and the winning candidate id (ties to the lowest id).
  * A key with no codebook yields NULL (the analog of an inner join
  * dropping the row). The codebooks ship once as a codegen reference
  * object; per row the work is a primitive k x dim loop inside
  * whole-stage codegen — no join, no shuffle, no HOF interpretation. */
case class ArgMinCodebook(vec: Expression, key: Expression,
    books: Map[Long, ArgBook]) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = key
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_codebook"
  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))

  private val jBooks: java.util.HashMap[java.lang.Long, ArgBook] = {
    val m = new java.util.HashMap[java.lang.Long, ArgBook]()
    books.foreach { case (k, b) => m.put(k, b) }
    m
  }

  override def nullSafeEval(v: Any, k: Any): Any = {
    val book = jBooks.get(k.asInstanceOf[java.lang.Long])
    if (book == null) null
    else ArgMinUtil.argmin(v.asInstanceOf[ArrayData], book)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, k) => {
      val booksRef = ctx.addReferenceObj("books", jBooks, "java.util.HashMap")
      val book = ctx.freshName("book")
      s"""
         |graft.expressions.ArgBook $book =
         |  (graft.expressions.ArgBook) $booksRef.get($k);
         |if ($book == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.ArgMinUtil.argmin($v, $book);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinCodebook =
    copy(vec = newLeft, key = newRight)
}
