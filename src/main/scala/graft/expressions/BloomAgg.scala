package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** Blocked Bloom filter over the library's deterministic mix64 hash chain:
  * `numBits` bits, `numHashes` probes derived from one 64-bit item hash by
  * mix64 re-mixing (Kirsch–Mitzenmacker double hashing). Never a false
  * negative; false-positive rate ≈ (1 − e^(−kn/m))^k. Merge is bitwise OR —
  * exact and order-independent, so partial aggregation parallelizes freely.
  *
  * The join-pruning use: build from the SMALL side's keys (one narrow agg),
  * broadcast the bytes, and filter the 100 TB probe side BEFORE its shuffle
  * — rows whose key cannot match never leave their input partition. With a
  * 1% FP rate and a selective key set, shuffle volume drops to roughly the
  * matching fraction of the big side. This is the manual, composable form
  * of runtime row-level filtering, usable anywhere a DataFrame is.
  */
final class BloomSketch(val numBits: Int, val numHashes: Int) extends Serializable {
  require(numBits >= 64 && numBits % 64 == 0,
    s"bloom: numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom: numHashes must be in [1,16], got $numHashes")
  private[expressions] val words: Array[Long] = new Array[Long](numBits / 64)

  @inline private def bit(h: Long, i: Int): Int = {
    val m = TextOps.mix64(h + i * 0x9E3779B97F4A7C15L)
    (((m >>> 1) % numBits)).toInt
  }

  def add(h: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val b = bit(h, i)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  def mightContain(h: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val b = bit(h, i)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def merge(other: BloomSketch): Unit = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"bloom: cannot merge sketches of different geometry " +
        s"($numBits/$numHashes vs ${other.numBits}/${other.numHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + words.length * 8)
    bb.putInt(numBits); bb.putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BloomSketch {
  def deserialize(bytes: Array[Byte]): BloomSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new BloomSketch(bb.getInt, bb.getInt)
    var i = 0
    while (i < s.words.length) { s.words(i) = bb.getLong; i += 1 }
    s
  }
}

/** graft_bloom_agg(key, numBits, numHashes) → binary Bloom filter of a
  * group's keys (same item hashing as the CMS — ints/longs by value,
  * strings by content). Null keys are skipped; an empty group yields an
  * empty (all-false) filter, not null, so downstream `might_contain`
  * prunes everything rather than failing.
  */
case class BloomAgg(first: Expression, second: Expression, third: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch] {

  override def children: Seq[Expression] = Seq(first, second, third)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = TextOps.checkArgs(prettyName, Seq(
      (first.dataType, CmsSketch.isCountable, "string, int, or bigint"),
      (second.dataType, TextOps.isInt, "int (numBits)"),
      (third.dataType, TextOps.isInt, "int (numHashes)")))
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: numBits and numHashes must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val geom: (Int, Int) = (
    second.eval(InternalRow.empty).asInstanceOf[Int],
    third.eval(InternalRow.empty).asInstanceOf[Int])

  override def createAggregationBuffer(): BloomSketch =
    new BloomSketch(geom._1, geom._2)

  override def update(buffer: BloomSketch, input: InternalRow): BloomSketch = {
    val v = first.eval(input)
    if (v != null) buffer.add(CmsSketch.hashItem(v))
    buffer
  }

  override def merge(b1: BloomSketch, b2: BloomSketch): BloomSketch = {
    b1.merge(b2); b1
  }

  override def eval(buffer: BloomSketch): Any = buffer.serialize()
  override def serialize(buffer: BloomSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BloomSketch =
    BloomSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(first = c(0), second = c(1), third = c(2))
}

/** graft_bloom_contains(bloom, key) → boolean; false is definitive, true
  * may be a false positive (pair with the real join for exactness).
  */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq(
      (left.dataType, _ == BinaryType, "binary (a graft_bloom_agg)"),
      (right.dataType, CmsSketch.isCountable, "string, int, or bigint")))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  // the prefilter use evaluates this once per PROBE row with the same
  // broadcast bloom bytes — deserializing per row would allocate the whole
  // filter 10⁹ times. Memoize on reference equality (no content assumption;
  // a scalar-subquery/literal bloom is the same array instance per task).
  // The (bytes, sketch) pair lives in ONE field updated by a single
  // reference assignment: two separate fields could interleave under
  // concurrent evaluation and pair one thread's ref with another's sketch —
  // a false negative here would silently drop true matches in BloomPrune.
  @transient private var memo: (Array[Byte], BloomSketch) = _

  override def nullSafeEval(bloom: Any, key: Any): Any = {
    val bytes = bloom.asInstanceOf[Array[Byte]]
    var m = memo
    if (m == null || !(m._1 eq bytes)) {
      m = (bytes, BloomSketch.deserialize(bytes))
      memo = m
    }
    m._2.mightContain(CmsSketch.hashItem(key))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
}
