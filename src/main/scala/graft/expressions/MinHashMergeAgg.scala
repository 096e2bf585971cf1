package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** graft_minhash_merge(sig) — aggregate MinHash signatures by elementwise
  * min. Because min-of-mins equals the min over the union of the underlying
  * shingle sets, the merged signature IS the MinHash signature of the whole
  * group's content: it supports group-level Jaccard estimation and
  * distinct-shingle sketching without ever re-reading the documents.
  *
  * A `TypedImperativeAggregate` (the sketch-aggregate extension point noted
  * in SURVEY §7.3): the buffer is a primitive long[], partial aggregation
  * happens map-side, and merge is elementwise min — O(k) state per group
  * regardless of group size.
  */
case class MinHashMergeAgg(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_merge"

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buffer: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val sig = v.asInstanceOf[ArrayData].toLongArray()
    if (buffer.isEmpty) sig.clone()
    else {
      require(buffer.length == sig.length,
        s"graft_minhash_merge: signature lengths differ (${buffer.length} vs ${sig.length})")
      var i = 0
      while (i < buffer.length) { if (sig(i) < buffer(i)) buffer(i) = sig(i); i += 1 }
      buffer
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"graft_minhash_merge: signature lengths differ (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 8)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashMergeAgg =
    copy(child = newChildren.head)
}
