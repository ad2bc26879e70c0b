package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Corpus-scale Gram-matrix aggregate: folds each micro-int vector's
  * d×d outer product into one flat `long[d*d + 1]` accumulator
  * map-side (cell 0 carries the row COUNT, cells 1.. the row-major
  * `Σ m_i·m_j`). Replaces the posexplode → self-join-on-vec_id →
  * hash-agg plan (d rows and d² join output rows per vector) with a
  * single pass: no explode, no join, no shuffle of anything bigger
  * than one 4096-cell buffer per partition. The merge is elementwise
  * addition, so partial aggregation distributes exactly; integer
  * sums keep the result bit-identical to the joined form at any
  * parallelism. Runs as ObjectHashAggregate (array-typed buffer);
  * the per-row cost is the same d² multiply-adds the join plan paid
  * AFTER materializing and shuffling them as rows. */
case class GramMatrix(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_matrix"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * dim + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"GramMatrix: vector dim ${arr.numElements()} != $dim")
      val m = new Array[Long](dim)
      var i = 0
      while (i < dim) { m(i) = arr.getLong(i); i += 1 }
      buf(0) += 1L
      i = 0
      while (i < dim) {
        val mi = m(i)
        val base = 1 + i * dim
        var j = 0
        while (j < dim) { buf(base + j) += mi * m(j); j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}
