package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** graft_quantize8(vec) → struct<scale: double, q: array<int>> — symmetric
  * int8 scalar quantization of an embedding: `q_i = floor(x_i·127/max|x| + ½)`
  * (explicit floor+½ so any engine reproduces the rounding bit-for-bit —
  * Java `Math.round` and SQL `round()` disagree on negative halves),
  * `scale = max|x|/127` the dequantization multiplier (`x ≈ q·scale`).
  *
  * The 100 TB story: a 768-dim float32 embedding is 3 KB; its int8 twin is
  * 768 B + 8. Shuffling, caching, and scanning ANN candidate sets at corpus
  * scale is 4× cheaper, and integer dot products rank candidates exactly
  * (int64 accumulation never loses associativity to float rounding).
  * Zero vectors quantize to all-zero with scale 0.
  */
case class Quantize8(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkVectors(prettyName, (child.dataType, true))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_quantize8"

  override def nullSafeEval(a: Any): Any = {
    val x = VecOps.toDoubles(a.asInstanceOf[ArrayData], VecOps.elemType(child.dataType))
    var maxAbs = 0.0
    var i = 0
    while (i < x.length) { val v = math.abs(x(i)); if (v > maxAbs) maxAbs = v; i += 1 }
    val q = new Array[Int](x.length)
    if (maxAbs > 0.0) {
      // evaluate in exactly the documented order — x·127/max|x| + ½ — so the
      // codes match any engine computing the same formula bit-for-bit
      // (hoisting 127/maxAbs into a reciprocal can differ in the last ulp
      // and flip a code on a .5 boundary)
      i = 0
      while (i < x.length) {
        q(i) = math.floor(x(i) * 127.0 / maxAbs + 0.5).toInt; i += 1
      }
    }
    InternalRow(if (maxAbs > 0.0) maxAbs / 127.0 else 0.0,
      new GenericArrayData(q.map(v => v: Any)))
  }

  override protected def withNewChildInternal(newChild: Expression): Quantize8 =
    copy(child = newChild)
}

/** graft_dot_q8(a, b) → bigint — exact integer dot product of two quantized
  * vectors (array<int>, same length). Rescale with the two `scale` factors
  * (`dot ≈ dotq·scale_a·scale_b`) when a similarity VALUE is needed; ranking
  * needs no rescale per fixed query vector.
  */
case class DotQuantized(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  private val isIntArray: DataType => Boolean = {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq(
      (left.dataType, isIntArray, "array<int>"),
      (right.dataType, isIntArray, "array<int>")))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_q8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toIntArray()
    val y = b.asInstanceOf[ArrayData].toIntArray()
    require(x.length == y.length,
      s"graft_dot_q8: vector lengths differ (${x.length} vs ${y.length})")
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i).toLong * y(i); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotQuantized =
    copy(left = l, right = r)
}
