package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst typed
  * aggregate: bounded memory (≤ `cap` counters) per partition, merge-
  * able partial states — the constant-space distributed answer to
  * "top k items over 100 TB" where an exact groupBy would shuffle
  * every distinct key. Counts are exact whenever the number of
  * distinct items stays ≤ cap (and within the classic n/cap error
  * bound otherwise).
  *
  * Output: array<struct<item string, cnt long>> — the top `k` by
  * (count desc, item asc), deterministic.
  */
case class TopKSketch(
    child: Expression,
    k: Int,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], item: String, n: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + n)
      case None if buf.size < cap => buf.update(item, n)
      case None =>
        // batched Misra–Gries decrement (Agarwal et al., "Mergeable
        // Summaries", PODS 2012 — the published generalization for
        // weighted arrivals/merges): INSERT the item, then subtract
        // the smallest of the cap+1 counts from everything and drop
        // the zeros. The r11 pre-fix version decremented by the FULL
        // incoming weight and discarded the item — a heavyweight
        // arrival wiped the buffer AND itself, far beyond the n/cap
        // bound the scaladoc promises; this form keeps the bound
        // under weighted merges too (second review).
        buf.update(item, n)
        val m = buf.values.min
        val dead = mutable.ArrayBuffer.empty[String]
        for ((key, c) <- buf) {
          if (c <= m) dead += key else buf.update(key, c - m)
        }
        dead.foreach(buf.remove)
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    for ((item, n) <- b) add(a, item, n)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)
    new GenericArrayData(top.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    for ((item, c) <- buf) { out.writeUTF(item); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { val item = in.readUTF(); buf.update(item, in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_sketch"
}
