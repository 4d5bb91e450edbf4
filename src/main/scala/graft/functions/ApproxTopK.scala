package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy hitters as a Catalyst TypedImperativeAggregate
  * — single-pass approximate top-k without a full `groupBy(term)`
  * shuffle: each partition keeps at most `capacity` (term, count)
  * counters (Metwally et al.'s space-saving replacement: evicting the
  * minimum and crediting its count to the newcomer), partial
  * summaries merge associatively, only `capacity`-sized buffers move.
  *
  * Guarantee (exact-pass variant within a partition, loosened by
  * merge): every term with true frequency > N/capacity appears in the
  * final summary. Counts are order-dependent overestimates, so they
  * are not cross-engine material — the oracle-checked query joins the
  * candidate set back to exact counts and thresholds on those
  * (wc_heavy_hitters), keeping the result deterministic while the
  * sketch does the single-pass discovery.
  */
case class ApproxTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType), StructField("cnt", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], term: String, n: Long): Unit = {
    buf.get(term) match {
      case Some(c) => buf.update(term, c + n)
      case None if buf.size < capacity => buf.update(term, n)
      case None =>
        // space-saving eviction: replace the minimum, credit its count
        val (minTerm, minCnt) = buf.minBy { case (t, c) => (c, t) }
        buf.remove(minTerm)
        buf.update(term, minCnt + n)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.toSeq.sortBy { case (t, c) => (-c, t) }.foreach { case (t, c) => add(a, t, c) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.toArray[Any]): ArrayData
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8 (writeUTF caps encoded terms at 64 KiB
    // and would throw mid-shuffle on long values of an arbitrary column)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopK =
    copy(child = newChildren.head)
}

object ApproxTopK {
  /** Column-API entry point: heavy-hitter summary of a string column. */
  def approx_top_k(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      ApproxTopK(ColumnBridge.expression(c), capacity).toAggregateExpression())
}
