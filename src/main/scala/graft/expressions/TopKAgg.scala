package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import scala.collection.mutable

/** graft_kmin(value, k) — the k SMALLEST values of any orderable type,
  * returned as an ascending array. The large-scale "top-k per group"
  * primitive: a `TypedImperativeAggregate` whose buffer is a k-capped heap,
  * so map-side partial aggregation reduces each task to at most k values per
  * group BEFORE the shuffle — groups × k × partitions shuffled rows instead
  * of the full input (the bound `Knn.bruteForce` relies on; a window
  * `row_number() <= k` would shuffle every input row).
  *
  * Descending top-k = wrap the value in a struct whose first field inverts
  * the ordering (e.g. `struct(-score, id)`) — struct ordering is
  * lexicographic, so ties break on the later fields.
  *
  * Nulls are ignored (SQL aggregate convention); an empty group yields an
  * empty array.
  */
case class TopKMinAgg(child: Expression, kExpr: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_kmin"

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"graft_kmin: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable ||
      !Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(kExpr.dataType))
      return TypeCheckResult.TypeCheckFailure(
        "graft_kmin: k must be an integer literal")
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // max-heap of the current k smallest: the worst kept value sits on top and
  // is evicted first
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] = {
    require(k > 0, s"graft_kmin: k must be positive, got $k")
    mutable.PriorityQueue.empty[Any](ordering)
  }

  /** Catalyst hands out reused/unsafe-backed values — copy before buffering. */
  private def copyValue(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: ArrayData => a.copy()
    case s: UTF8String => s.copy()
    case other => other
  }

  private def insert(heap: mutable.PriorityQueue[Any], v: Any, owned: Boolean): Unit = {
    if (heap.size < k) heap.enqueue(if (owned) v else copyValue(v))
    else if (ordering.lt(v, heap.head)) {
      heap.dequeue()
      heap.enqueue(if (owned) v else copyValue(v))
    }
  }

  // a struct whose FIRST field (the primary sort key by the documented
  // struct(-score, id) convention) is null is a null sort key and is
  // ignored like a null value: struct ordering sorts nulls FIRST, so one
  // null-scored row (a zero vector's null cosine, a null PQ code's null
  // ADC distance) would otherwise sit at the heap top as "smallest",
  // never be evicted, and rank ahead of every real match
  private def nullSortKey(v: Any): Boolean = v match {
    case r: InternalRow => child.dataType match {
      case s: StructType => s.nonEmpty && r.isNullAt(0)
      case _ => false
    }
    case _ => false
  }

  override def update(heap: mutable.PriorityQueue[Any],
                      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null && !nullSortKey(v)) insert(heap, v, owned = false)
    heap
  }

  override def merge(b1: mutable.PriorityQueue[Any],
                     b2: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    b2.foreach(v => insert(b1, v, owned = true)) // b2's values are already copies
    b1
  }

  override def eval(heap: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(heap.toArray.sorted(ordering))

  // one-field UnsafeRow per value: covers every orderable type (atomic,
  // struct, array) with correct binary round-tripping
  @transient private lazy val ser = UnsafeProjection.create(Array(child.dataType))

  override def serialize(heap: mutable.PriorityQueue[Any]): Array[Byte] = {
    val rows = heap.toArray.map(v => ser(InternalRow(v)).copy())
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val sz = bb.getInt
      val buf = new Array[Byte](sz)
      bb.get(buf)
      val row = new UnsafeRow(1)
      row.pointTo(buf, sz)
      heap.enqueue(copyValue(row.get(0, child.dataType)))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKMinAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
