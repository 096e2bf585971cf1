package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** graft_pq_encode(vec, centers) → array<int> — product-quantization codes:
  * for each subspace mi, the index of the nearest center (first on ties).
  * `centers` must be FOLDABLE (array<array<array<double>>>, m × kc × d/m):
  * it is evaluated once per task and cached, so the per-row work is one
  * tight argmin loop — the HOF formulation (`transform`+`aggregate`) is
  * CodegenFallback-interpreted per ELEMENT with boxing, ~m·kc·(d/m) boxed
  * ops per row, which is the difference between a scan and a job at corpus
  * scale (DESIGN.md "Why the hot loops are native expressions").
  *
  * Arithmetic note: center components are rounded THROUGH Float before the
  * distance math, matching the HOF formulation's `.cast("float")` (the
  * codebooks ride as doubles but quantize to float32 precision) — the two
  * paths produce identical codes by construction (asserted in PqSpec).
  */
case class PqEncode(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes() =
    VecOps.checkVectors(prettyName, (left.dataType, true))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // NaN/Inf vectors (e.g. a zero vector through l2-normalize) encode to
  // null, mirroring the HOF formulation (array_position over all-NaN
  // distances finds nothing) — null codes drop out of ADC scoring instead
  // of polluting the candidate heap with NaN distances
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val centers: Array[Array[Array[Double]]] = {
    require(right.foldable, s"$prettyName centers must be foldable")
    val outer = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { mi =>
      val mid = outer.getArray(mi)
      Array.tabulate(mid.numElements()) { j =>
        mid.getArray(j).toDoubleArray().map(c => c.toFloat.toDouble)
      }
    }
  }

  override def nullSafeEval(v: Any, ignored: Any): Any = {
    val x = VecOps.toDoubles(v.asInstanceOf[ArrayData],
      VecOps.elemType(left.dataType))
    var fi = 0
    while (fi < x.length) {
      if (!java.lang.Double.isFinite(x(fi))) return null
      fi += 1
    }
    val m = centers.length
    val sub = if (m > 0) centers(0)(0).length else 0
    // dimension mismatch fails LOUDLY: a longer vector would silently
    // encode from a prefix with the wrong subspace layout (wrong ANN
    // results), a shorter one would crash with a bare index error
    if (x.length != m * sub)
      throw new IllegalArgumentException(
        s"$prettyName: vector dim ${x.length} != codebook dim ${m * sub} " +
          s"(m=$m x sub=$sub) — the codebook was trained on different " +
          "embeddings")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val cs = centers(mi)
      val off = mi * sub
      var best = 0; var bestD = Double.MaxValue; var j = 0
      while (j < cs.length) {
        val c = cs(j)
        var d = 0.0; var i = 0
        while (i < sub) { val diff = x(off + i) - c(i); d += diff * diff; i += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(mi) = best; mi += 1
    }
    new GenericArrayData(codes.map(v2 => v2: Any))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** graft_pq_adc(codes, tbl) → double — asymmetric-distance lookup sum:
  * `Σ_mi tbl[mi][codes[mi]]`, accumulated in mi order from 0.0 (identical
  * IEEE sequence to the HOF `aggregate(zip_with(...))` it replaces). This
  * runs once per CANDIDATE row in a PQ/IVF-PQ scan — the hottest loop of
  * the ANN read path.
  */
case class PqAdc(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codesAny: Any, tblAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val tbl = tblAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0.0
    var mi = 0
    while (mi < m) {
      s += tbl.getArray(mi).getDouble(codes.getInt(mi))
      mi += 1
    }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
