package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise INTEGERIZED mean of double vectors as one imperative
  * aggregate — the k-means centroid update, replacing a 64-way
  * `posexplode` + (cid, dim) aggregation + `collect_list`/sort
  * re-assembly per training iteration with a single `groupBy(cid)`
  * whose buffer is the running per-dimension sum.
  *
  * Exactness across engines and partitionings: each element
  * contributes `floor(x·scale + 0.5)` — an INTEGER (stored in a
  * double, exact below 2⁵³) — so partial sums are order- and
  * partition-independent, and the final `sum / count / scale` equals
  * the relational form and its DuckDB-oracle mirror bit-for-bit.
  * This is exactly why the trainer integerizes means: float addition
  * would be order-dependent and the oracle compare unstable.
  *
  * Buffer: (count, sums[dim]) sized on first input; merging an empty
  * buffer is the identity. Null vectors/elements are skipped/0.
  * Mismatched vector lengths THROW: ragged inputs are not
  * averageable, and because the buffer dimension is set by whichever
  * vector a partition happens to see first, silently truncating would
  * make the result partition-order-dependent.
  */
case class VectorMean(
    child: Expression,
    scale: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMean.Buf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VectorMean.Buf =
    new VectorMean.Buf(0L, null)

  override def update(buf: VectorMean.Buf, input: InternalRow): VectorMean.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      if (n != buf.sums.length)
        throw new IllegalArgumentException(
          s"vector_mean: dimension mismatch ($n vs ${buf.sums.length})")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          buf.sums(i) += math.floor(arr.getDouble(i) * scale + 0.5)
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(a: VectorMean.Buf, b: VectorMean.Buf): VectorMean.Buf = {
    if (b.sums != null) {
      if (a.sums == null) { a.sums = b.sums; a.count = b.count }
      else {
        if (a.sums.length != b.sums.length)
          throw new IllegalArgumentException(
            s"vector_mean: dimension mismatch (${b.sums.length} vs ${a.sums.length})")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.count += b.count
      }
    }
    a
  }

  override def eval(buf: VectorMean.Buf): Any =
    if (buf.sums == null) null
    else new GenericArrayData(buf.sums.map(s => s / buf.count / scale))

  override def serialize(buf: VectorMean.Buf): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 * n)
    bb.putLong(buf.count)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMean.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val n = bb.getInt()
    if (n == 0) new VectorMean.Buf(count, null)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = bb.getDouble(); i += 1 }
      new VectorMean.Buf(count, sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMean =
    copy(child = newChildren.head)
}

object VectorMean {
  final class Buf(var count: Long, var sums: Array[Double])

  /** Column-API entry point: integerized element-wise mean. */
  def vector_mean(v: Column, scale: Double): Column =
    ColumnBridge.column(VectorMean(ColumnBridge.expression(v), scale)
      .toAggregateExpression())
}
