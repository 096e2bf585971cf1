package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column data layout: Z-order (Morton-curve) clustering, so parquet
  * row-group min/max stats stay TIGHT on every clustered column at once and
  * point/range predicates on any of them skip most row groups at scan time
  * — the table-format-style layout lever (Delta/Iceberg `OPTIMIZE ZORDER
  * BY`) for plain parquet dirs. Sorting by `(a, b)` gives perfect pruning
  * on `a` and none on `b`; interleaving the bits of both ranks gives good
  * pruning on each — at 100 TB the difference between reading 2% and 100%
  * of a table for a secondary-column predicate.
  *
  * Plan shape: one tiny min/max agg job (per-column linear bucketing
  * bounds), then ONE range shuffle on the z-value + an in-partition sort —
  * the same cost as any global sort-for-layout write. Bucketing is linear
  * in [min,max]; heavily skewed columns deserve a quantile bucketing via
  * `graft_kll_quantiles` boundaries before interleaving (same z-value
  * machinery applies).
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i. */
  private def spread16(c: Column): Column =
    (0 until 16).map(i =>
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), 2 * i))
      .reduce(_ bitwiseOR _)

  /** Morton-interleave two 16-bit bucket ids into one 32-bit z-value. */
  def zvalue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Linear 16-bit bucket id of `c` within [lo, hi]; nulls first (0). */
  def bucket16(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, Double.MinPositiveValue)
    val scaled = ((c.cast("double") - lit(lo)) / lit(span)) * lit(65535.0)
    coalesce(least(greatest(scaled.cast("long"), lit(0L)), lit(65535L)), lit(0L))
  }

  /** Rewrite `df` Z-order-clustered on two numeric columns into
    * `outPartitions` range partitions (→ output files), each sorted by
    * z-value. Write the result with `maxRecordsPerFile`/`partitionBy` as
    * usual; row-group stats on BOTH columns come out tight.
    */
  def zorder(df: DataFrame, colA: String, colB: String,
             outPartitions: Int): DataFrame = {
    require(outPartitions > 0, s"outPartitions must be positive")
    // one cheap agg job for the bucketing bounds (min/max only — no full
    // sort, no count); the data itself moves exactly once, in the range
    // shuffle below
    val row = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    require(!row.anyNull, s"zorder: $colA/$colB are entirely null")
    val zv = zvalue(
      bucket16(col(colA), row.getDouble(0), row.getDouble(1)),
      bucket16(col(colB), row.getDouble(2), row.getDouble(3)))
    df.repartitionByRange(outPartitions, zv).sortWithinPartitions(zv)
  }

  /** [[zorder]] for SKEWED columns: bucket by KLL quantile boundaries (256
    * per column — one sketch pass via `graft_kll_quantiles`) instead of a
    * linear [min,max] split, so every bucket holds ~equal row counts. Under
    * heavy skew linear bucketing collapses most rows into a few buckets and
    * file stats stop pruning; equi-depth bucketing keeps them tight
    * everywhere. Costs one extra sketch aggregation job before the single
    * range shuffle.
    */
  def zorderQuantile(df: DataFrame, colA: String, colB: String,
                     outPartitions: Int, sketchK: Int = 200): DataFrame = {
    require(outPartitions > 0, s"outPartitions must be positive")
    graft.GraftFunctions.register(df.sparkSession)
    val probs = array((1 until 256).map(i => lit(i / 256.0)): _*)
    val row = df.agg(
      call_function("graft_kll_quantiles", col(colA).cast("double"), probs, lit(sketchK)),
      call_function("graft_kll_quantiles", col(colB).cast("double"), probs, lit(sketchK))).head()
    require(!row.anyNull, s"zorderQuantile: $colA/$colB are entirely null")
    def bucket(c: String, boundaries: Seq[Double]): Column =
      call_function("graft_bucket", col(c).cast("double"),
        lit(boundaries.toArray))
    val zv = zvalue(
      bucket(colA, row.getSeq[Double](0)).cast("long"),
      bucket(colB, row.getSeq[Double](1)).cast("long"))
    df.repartitionByRange(outPartitions, zv).sortWithinPartitions(zv)
  }
}
