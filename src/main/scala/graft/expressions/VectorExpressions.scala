package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector math over `array<float>` / `array<double>` embedding
  * columns — primitive loops instead of interpreted `zip_with`+`aggregate`
  * chains (~100 ns vs ~40 µs per 64-dim pair). All math in double.
  */
private[expressions] object VecOps {
  def toDoubles(a: ArrayData, elem: DataType): Array[Double] = elem match {
    case DoubleType => a.toDoubleArray()
    case FloatType =>
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    case t => throw new IllegalArgumentException(s"unsupported vector element type $t")
  }

  @inline def elemType(dt: DataType): DataType = dt.asInstanceOf[ArrayType].elementType

  /** array<float> | array<double> — the two embedding layouts we accept;
    * anything else is an analysis error rather than an executor-side CCE.
    */
  val isVector: DataType => Boolean = {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  def checkVectors(name: String, args: (DataType, Boolean)*): TypeCheckResult =
    graft.expressions.TextOps.checkArgs(name, args.map {
      case (dt, true) => (dt, isVector, "array<float> or array<double>")
      case (dt, false) => (dt, graft.expressions.TextOps.isInt, "int")
    })
}

/** graft_dot(a, b) → double dot product (arrays must be same length). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkVectors(prettyName, (left.dataType, true), (right.dataType, true))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = VecOps.toDoubles(a.asInstanceOf[ArrayData], VecOps.elemType(left.dataType))
    val y = VecOps.toDoubles(b.asInstanceOf[ArrayData], VecOps.elemType(right.dataType))
    require(x.length == y.length,
      s"graft_dot: vector lengths differ (${x.length} vs ${y.length})")
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** graft_l2norm(a) → array<double> unit-normalized; null for zero vectors. */
case class L2Normalize(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkVectors(prettyName, (child.dataType, true))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2norm"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = VecOps.toDoubles(a.asInstanceOf[ArrayData], VecOps.elemType(child.dataType))
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    if (s == 0.0) return null
    val inv = 1.0 / math.sqrt(s)
    i = 0
    while (i < x.length) { x(i) *= inv; i += 1 }
    new GenericArrayData(x.map(v => v: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** graft_cosine(a, b) → double cosine similarity; null on zero vectors. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkVectors(prettyName, (left.dataType, true), (right.dataType, true))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = VecOps.toDoubles(a.asInstanceOf[ArrayData], VecOps.elemType(left.dataType))
    val y = VecOps.toDoubles(b.asInstanceOf[ArrayData], VecOps.elemType(right.dataType))
    require(x.length == y.length,
      s"graft_cosine: vector lengths differ (${x.length} vs ${y.length})")
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < x.length) { dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
    if (nx == 0.0 || ny == 0.0) null else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** graft_hyperplane_lsh(vec, nBits, seed) → long signature of sign bits of
  * projections onto deterministic hash-derived hyperplanes.
  */
case class HyperplaneLsh(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkVectors(prettyName,
      (first.dataType, true), (second.dataType, false), (third.dataType, false))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_lsh"

  override def nullSafeEval(a: Any, nBitsA: Any, seedA: Any): Any = {
    val x = VecOps.toDoubles(a.asInstanceOf[ArrayData], VecOps.elemType(first.dataType))
    val nBits = nBitsA.asInstanceOf[Int]
    // the signature packs into one long: past 64, (1L << b) wraps and
    // bit b silently aliases bit b-64 — degraded buckets with no error
    require(nBits >= 1 && nBits <= 64,
      s"$prettyName: nBits must be in [1, 64], got $nBits")
    val seed = seedA.asInstanceOf[Int].toLong
    var out = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      var i = 0
      while (i < x.length) {
        // deterministic pseudo-random component in [-1, 1)
        val h = TextOps.mix64(seed * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL + i)
        proj += x(i) * (((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0)
        i += 1
      }
      if (proj >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): HyperplaneLsh =
    copy(first = a, second = b, third = c)
}
