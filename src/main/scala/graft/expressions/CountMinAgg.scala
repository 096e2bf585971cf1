package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** Count-min sketch: `depth` hash rows × `width` counters; an item's
  * estimated count is the MIN of its counters — always an OVERestimate,
  * within `2n/width` of truth with probability `1 − 2^−depth`. The frequency
  * member of graft's mergeable-sketch family (KLL → quantiles, HLL →
  * distinct, MinHash → Jaccard, CMS → per-item counts): sketch each shard /
  * day at ingest, store the bytes, answer "how often did X occur" at query
  * time by merging sketches — O(sketches), never a re-scan of 100 TB.
  *
  * Merge is elementwise counter addition, which is exact (the merged sketch
  * equals the sketch of the concatenated streams), so partial aggregation
  * and reduce-tree order cannot change the result. Hashing is the library's
  * deterministic mix64 chain — no seed material ships with the sketch, but
  * `depth`/`width` do, and mixing geometries is rejected loudly.
  */
final class CmsSketch(val depth: Int, val width: Int) extends Serializable {
  require(depth >= 1 && depth <= 16, s"cms: depth must be in [1,16], got $depth")
  require(width >= 8, s"cms: width must be >= 8, got $width")
  private[expressions] val counts: Array[Array[Long]] = Array.ofDim[Long](depth, width)
  private[expressions] var total: Long = 0L

  @inline private def bucket(row: Int, h: Long): Int = {
    val m = TextOps.mix64(h ^ (row * 0xC2B2AE3D27D4EB4FL + 0x9E3779B97F4A7C15L))
    // non-negative mod width
    ((m >>> 1) % width).toInt
  }

  def add(h: Long, n: Long = 1L): Unit = {
    var r = 0
    while (r < depth) { counts(r)(bucket(r, h)) += n; r += 1 }
    total += n
  }

  def estimate(h: Long): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r)(bucket(r, h))
      if (c < est) est = c
      r += 1
    }
    est
  }

  def merge(other: CmsSketch): Unit = {
    require(other.depth == depth && other.width == width,
      s"cms: cannot merge sketches of different geometry " +
        s"(${depth}x$width vs ${other.depth}x${other.width})")
    var r = 0
    while (r < depth) {
      var c = 0
      while (c < width) { counts(r)(c) += other.counts(r)(c); c += 1 }
      r += 1
    }
    total += other.total
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + 8 + depth * width * 8)
    bb.putInt(depth); bb.putInt(width); bb.putLong(total)
    var r = 0
    while (r < depth) {
      var c = 0
      while (c < width) { bb.putLong(counts(r)(c)); c += 1 }
      r += 1
    }
    bb.array()
  }
}

object CmsSketch {
  def deserialize(bytes: Array[Byte]): CmsSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new CmsSketch(bb.getInt, bb.getInt)
    s.total = bb.getLong
    var r = 0
    while (r < s.depth) {
      var c = 0
      while (c < s.width) { s.counts(r)(c) = bb.getLong; c += 1 }
      r += 1
    }
    s
  }

  /** One deterministic 64-bit hash per item, shared by update and query.
    * Integer types hash by VALUE (an int 7 and a long 7 are the same item);
    * strings by content.
    */
  def hashItem(v: Any): Long = v match {
    case s: UTF8String => TextOps.hashString(s.toString, 0L)
    case s: String => TextOps.hashString(s, 0L)
    case l: Long => TextOps.mix64(l)
    case i: Int => TextOps.mix64(i.toLong)
    case other => throw new IllegalArgumentException(
      s"cms: unsupported item type ${other.getClass.getName}")
  }

  val isCountable: DataType => Boolean = {
    case _: StringType | LongType | IntegerType => true
    case _ => false
  }
}

/** graft_cms_sketch(item, depth, width) → binary count-min sketch of a
  * group's items, for storing and later [[CmsMergeAgg]] + [[CmsValue]].
  * Null items are skipped; an empty group yields null.
  */
case class CmsSketchAgg(first: Expression, second: Expression, third: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsSketch] {

  override def children: Seq[Expression] = Seq(first, second, third)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = TextOps.checkArgs(prettyName, Seq(
      (first.dataType, CmsSketch.isCountable, "string, int, or bigint"),
      (second.dataType, TextOps.isInt, "int (depth)"),
      (third.dataType, TextOps.isInt, "int (width)")))
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: depth and width must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val geom: (Int, Int) = (
    second.eval(InternalRow.empty).asInstanceOf[Int],
    third.eval(InternalRow.empty).asInstanceOf[Int])

  override def createAggregationBuffer(): CmsSketch =
    new CmsSketch(geom._1, geom._2)

  override def update(buffer: CmsSketch, input: InternalRow): CmsSketch = {
    val v = first.eval(input)
    if (v != null) buffer.add(CmsSketch.hashItem(v))
    buffer
  }

  override def merge(b1: CmsSketch, b2: CmsSketch): CmsSketch = { b1.merge(b2); b1 }

  override def eval(buffer: CmsSketch): Any =
    if (buffer.total == 0L) null else buffer.serialize()

  override def serialize(buffer: CmsSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsSketch = CmsSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsSketchAgg =
    copy(first = c(0), second = c(1), third = c(2))
}

/** graft_cms_merge(sketch) → union stored CMS bytes (from [[CmsSketchAgg]])
  * into one sketch — merge a year of daily sketches without re-reading rows.
  * Geometry mismatches fail loudly. Null for an all-null group.
  */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CmsSketch]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq(
      (child.dataType, _ == BinaryType, "binary (a graft_cms_sketch)")))

  override def createAggregationBuffer(): Option[CmsSketch] = None

  override def update(buffer: Option[CmsSketch], input: InternalRow): Option[CmsSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val s = CmsSketch.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case None => Some(s)
        case Some(acc) => acc.merge(s); buffer
      }
    }
  }

  override def merge(b1: Option[CmsSketch], b2: Option[CmsSketch]): Option[CmsSketch] =
    (b1, b2) match {
      case (Some(a), Some(b)) => a.merge(b); b1
      case (None, _) => b2
      case _ => b1
    }

  override def eval(buffer: Option[CmsSketch]): Any =
    buffer.map(_.serialize()).orNull

  override def serialize(buffer: Option[CmsSketch]): Array[Byte] =
    buffer.map(_.serialize()).getOrElse(Array.empty)
  override def deserialize(bytes: Array[Byte]): Option[CmsSketch] =
    if (bytes.isEmpty) None else Some(CmsSketch.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = c.head)
}

/** graft_cms_value(sketch, item) → bigint estimated count of `item` in a
  * stored sketch (always ≥ the true count). Null sketch → null.
  */
case class CmsValue(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq(
      (left.dataType, _ == BinaryType, "binary (a graft_cms_sketch)"),
      (right.dataType, CmsSketch.isCountable, "string, int, or bigint")))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_value"

  override def nullSafeEval(sk: Any, item: Any): Any =
    CmsSketch.deserialize(sk.asInstanceOf[Array[Byte]])
      .estimate(CmsSketch.hashItem(item))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsValue =
    copy(left = l, right = r)
}
