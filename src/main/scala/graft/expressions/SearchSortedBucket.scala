package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** graft_bucket(x, boundaries) — equi-depth bucket id: the number of
  * `boundaries` (a sorted literal array<double>, e.g. KLL quantile cut
  * points) that are `<= x`, via binary search — `searchsorted` for layout
  * bucketing ([[graft.pipeline.Layout.zorderQuantile]]). Returns 0..N for N
  * boundaries. Interpreted evaluation is ~8 compares/row for 256
  * boundaries — negligible in a layout-write pass (a 256-step higher-order
  * `aggregate` would be the slow way).
  */
case class SearchSortedBucket(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: x must be double")
    else if (!right.foldable || !right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: boundaries must be a literal array<double>")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val boundaries: Array[Double] = {
    val arr = right.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[ArrayData].toDoubleArray()
    require((1 until arr.length).forall(i => arr(i - 1) <= arr(i)),
      s"$prettyName: boundaries must be sorted ascending")
    arr
  }

  override protected def nullSafeEval(x: Any, bounds: Any): Any = {
    val v = x.asInstanceOf[Double]
    // NaN takes the TOP bucket, where Spark's sort order places it
    // (greater than every double) — falling through the <= comparisons
    // would land it in bucket 0, co-locating NaN rows with the smallest
    // values in quantile layouts
    if (java.lang.Double.isNaN(v)) return boundaries.length
    // count of boundaries <= v: binarySearch gives insertion point; step
    // over equal runs so ties land in the upper bucket consistently
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SearchSortedBucket =
    copy(left = newLeft, right = newRight)
}
