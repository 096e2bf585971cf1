package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** A KLL-style streaming quantile sketch: bounded memory
  * (~k·log(n/k) doubles), one pass, mergeable across partitions — the
  * percentile primitive that works at 100 TB where exact `percentile()`
  * (sort or full value collection per group) cannot. Rank error is
  * O(1/k)·polylog w.h.p.; k=200 lands comfortably under 2% observed.
  *
  * Level i holds items of weight 2^i. A full level sorts, keeps alternating
  * survivors (deterministic alternation instead of coin flips — reproducible
  * for a fixed insertion order, same guarantees in expectation), and
  * promotes them. Per-level capacity decays geometrically from the top
  * (classic KLL shape) with a floor of 8.
  */
final class KllSketch(initK: Int) extends Serializable {
  private var _k: Int = initK
  def k: Int = _k
  require(k >= 8, s"kll: k must be >= 8, got $k")
  private[expressions] val levels = ArrayBuffer(ArrayBuffer.empty[Double])
  private[expressions] var count: Long = 0L
  private[expressions] var flip: Int = 0

  private def capacity(level: Int): Int = {
    val depthFromTop = levels.size - 1 - level
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depthFromTop)).toInt)
  }

  def update(v: Double): Unit = {
    if (!v.isNaN) {
      levels(0) += v
      count += 1L
      if (levels(0).size >= capacity(0)) compactFrom(0)
    }
  }

  private def compactLevel(l: Int): Unit = {
    if (l + 1 >= levels.size) levels += ArrayBuffer.empty[Double]
    val sorted = levels(l).sortInPlace()
    val offset = flip & 1
    flip += 1
    var i = offset
    while (i < sorted.size) { levels(l + 1) += sorted(i); i += 2 }
    levels(l) = ArrayBuffer.empty[Double]
  }

  private def compactFrom(start: Int): Unit = {
    var l = start
    while (l < levels.size && levels(l).size >= capacity(l)) {
      compactLevel(l)
      l += 1
    }
  }

  /** Restore the capacity invariant on EVERY level — required after merge,
    * which can overfill any level, not just a cascade from level 0 (a
    * bottom-up `compactFrom(0)` stops at the first under-capacity level and
    * would leave higher levels permanently oversized, degrading sketch size
    * toward O(partitions·k) across a reduce tree). Adding a level shrinks
    * lower capacities, so sweep until stable.
    */
  private def compactAll(): Unit = {
    var changed = true
    while (changed) {
      changed = false
      var l = 0
      while (l < levels.size) {
        if (levels(l).size >= capacity(l) && levels(l).nonEmpty) {
          compactLevel(l)
          changed = true
        }
        l += 1
      }
    }
  }

  def merge(other: KllSketch): Unit = {
    // Sketches built with different k are merged by downgrading to the
    // SMALLER k deterministically (order-independent: min is commutative),
    // so the result's capacities/error bounds are those of the weakest
    // input rather than whichever side happened to deserialize first.
    if (other.k != _k) _k = math.min(_k, other.k)
    while (levels.size < other.levels.size) levels += ArrayBuffer.empty[Double]
    var l = 0
    while (l < other.levels.size) {
      levels(l) ++= other.levels(l)
      l += 1
    }
    count += other.count
    flip += other.flip // keep alternation moving after merges
    compactAll()
  }

  /** Lower-biased rank selection over the weighted items. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile prob out of range: $q")
    val items = ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.size) {
      val w = 1L << l
      levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    require(items.nonEmpty, "empty sketch")
    val sorted = items.sortBy(_._1)
    val totalW = sorted.iterator.map(_._2).sum
    val target = q * (totalW - 1)
    var cum = 0L
    var i = 0
    while (i < sorted.size) {
      cum += sorted(i)._2
      if (cum > target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val total = 4 + 8 + 4 + 4 + levels.map(4 + _.size * 8).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(k); bb.putLong(count); bb.putInt(flip); bb.putInt(levels.size)
    levels.foreach { lv =>
      bb.putInt(lv.size)
      lv.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object KllSketch {
  def deserialize(bytes: Array[Byte]): KllSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new KllSketch(bb.getInt)
    s.count = bb.getLong
    s.flip = bb.getInt
    val nLevels = bb.getInt
    s.levels.clear()
    var l = 0
    while (l < nLevels) {
      val n = bb.getInt
      val lv = new ArrayBuffer[Double](n)
      var i = 0
      while (i < n) { lv += bb.getDouble; i += 1 }
      s.levels += lv
      l += 1
    }
    s
  }
}

/** graft_kll_sketch(x, k) — the serialized [[KllSketch]] of a group as
  * `binary`, for STORING sketches (per day / partition / shard) and
  * re-aggregating them later with [[KllMergeAgg]] — the pattern that makes
  * 100 TB percentile dashboards O(sketches) instead of O(rows): sketch once
  * at ingest, merge sketches at query time. Null for an empty group.
  */
case class KllSketchAgg(child: Expression, kExpr: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] {

  private val inner = KllQuantilesAgg(child,
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(0.5), ArrayType(DoubleType)), kExpr)

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_sketch"

  override def checkInputDataTypes(): TypeCheckResult = inner.checkInputDataTypes()
  override def createAggregationBuffer(): KllSketch = inner.createAggregationBuffer()
  override def update(s: KllSketch, input: InternalRow): KllSketch = inner.update(s, input)
  override def merge(s1: KllSketch, s2: KllSketch): KllSketch = inner.merge(s1, s2)
  override def eval(s: KllSketch): Any = if (s.count == 0L) null else s.serialize()
  override def serialize(s: KllSketch): Array[Byte] = s.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** graft_kll_merge(sketch) — union stored KLL sketches (binary, from
  * [[KllSketchAgg]]) into one, preserving error bounds: merge a year of
  * daily sketches without touching a row of raw data. Null sketches are
  * skipped; null for an all-null group.
  */
case class KllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[KllSketch]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary sketch column, got ${child.dataType}")

  override def createAggregationBuffer(): Option[KllSketch] = None

  override def update(buf: Option[KllSketch], input: InternalRow): Option[KllSketch] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = KllSketch.deserialize(v.asInstanceOf[Array[Byte]])
      buf match {
        case Some(acc) => acc.merge(s); buf
        case None => Some(s)
      }
    }
  }

  override def merge(b1: Option[KllSketch], b2: Option[KllSketch]): Option[KllSketch] =
    (b1, b2) match {
      case (Some(a), Some(b)) => a.merge(b); b1
      case (Some(_), None) => b1
      case _ => b2
    }

  override def eval(buf: Option[KllSketch]): Any = buf.map(_.serialize()).orNull

  override def serialize(buf: Option[KllSketch]): Array[Byte] =
    buf.map(_.serialize()).getOrElse(Array.empty)
  override def deserialize(bytes: Array[Byte]): Option[KllSketch] =
    if (bytes.isEmpty) None else Some(KllSketch.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** graft_kll_value(sketch, prob) — quantile at `prob` from a stored binary
  * KLL sketch. Evaluates once per sketch row (post-aggregation cardinality:
  * groups, not data rows), so interpreted evaluation is immaterial here.
  */
case class KllValue(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_value"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: sketch must be binary")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: prob must be double")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(sketch: Any, prob: Any): Any =
    KllSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
      .quantile(prob.asInstanceOf[Double])

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KllValue =
    copy(left = newLeft, right = newRight)
}

/** graft_kll_quantiles(x, probs, k) — approximate quantiles of `x` at each
  * probability in the literal array `probs`, via a mergeable [[KllSketch]]
  * with parameter `k`. Returns `array<double>` aligned with `probs`; null
  * for an empty group. Nulls and NaNs in `x` are ignored.
  */
case class KllQuantilesAgg(child: Expression, probsExpr: Expression,
                           kExpr: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] {

  override def children: Seq[Expression] = Seq(child, probsExpr, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName: x must be numeric, got ${child.dataType}")
    else if (!probsExpr.foldable || !probsExpr.dataType.isInstanceOf[ArrayType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName: probs must be a literal array")
    else if (!kExpr.foldable ||
      !Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalArgumentException(
      s"$prettyName: unsupported input type $other")
  }

  private lazy val probs: Array[Double] = {
    val arr = probsExpr.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val et = probsExpr.dataType.asInstanceOf[ArrayType].elementType
    (0 until arr.numElements()).map { i =>
      et match {
        case DoubleType => arr.getDouble(i)
        case FloatType => arr.getFloat(i).toDouble
        case _: DecimalType => arr.get(i, et).asInstanceOf[Decimal].toDouble
        case IntegerType => arr.getInt(i).toDouble
        case LongType => arr.getLong(i).toDouble
        case other => throw new IllegalArgumentException(
          s"$prettyName: unsupported probs element type $other")
      }
    }.toArray
  }

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"$prettyName: k must be an integer literal, got $other")
  }

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(s: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) s.update(toDouble(v))
    s
  }

  override def merge(s1: KllSketch, s2: KllSketch): KllSketch = { s1.merge(s2); s1 }

  override def eval(s: KllSketch): Any =
    if (s.count == 0L) null
    else new GenericArrayData(probs.map(p => s.quantile(p): Any))

  override def serialize(s: KllSketch): Array[Byte] = s.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllQuantilesAgg =
    copy(child = newChildren(0), probsExpr = newChildren(1), kExpr = newChildren(2))
}
