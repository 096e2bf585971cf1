package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling with gap-fill: aggregate per `(keys, time bucket)`
  * and densify each key's series to a regular grid from its first to its
  * last bucket, filling empty buckets with defaults. The reference's intraday
  * series (`FitbitIntradayCombined` rows, Garmin offset arrays —
  * `/root/reference/src/glue/resources/table_columns.yaml:521-561`,
  * `src/glue/jobs/s3_to_json.py:217-251`) are irregular samples; any
  * downstream analytics (hourly summaries, coverage checks) need exactly
  * this densification.
  *
  * Spark-first plan: the grid is generated WITH `sequence()` + `explode`
  * from each key's `(min, max)` bucket — one row per key pre-explode, fully
  * distributed, no driver-side calendar and no cross join against a
  * materialized dimension. Cost = one groupBy shuffle for the aggregates,
  * one for the per-key span, and an equi join of grid↔aggregates that
  * partitions the same way. Grid size is `span/step` rows per key — bounded
  * by the retention window at any scale.
  *
  * `aggs` are the per-bucket aggregates (name → aggregate column);
  * `fills` the value an absent bucket takes (name → literal).
  */
object Resample {

  def gapFill(df: DataFrame, keys: Seq[String], tsCol: String, step: Long,
              aggs: Seq[(String, Column)], fills: Seq[(String, Column)],
              maxBucketsPerKey: Long = 10000000L): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    // exact integer floor-bucket — double division of int64 nanos loses
    // ~128 ns of precision and mis-buckets boundary-adjacent events.
    // A null timestamp would form a __bucket group the grid (min/max ignore
    // nulls) never contains — silently dropped rows; fail loudly instead,
    // in-plan, with no extra validation pass
    val bucket = when(col(tsCol).isNotNull,
        col(tsCol) - pmod(col(tsCol), lit(step)))
      .otherwise(raise_error(concat(
        lit(s"gapFill: null $tsCol for key "),
        concat_ws(",", keys.map(k => col(k).cast("string")): _*))).cast("long"))
      .cast("long")

    val perBucket = df.groupBy((keys.map(col) :+ bucket.as("__bucket")): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)

    // a single corrupt timestamp (epoch 0 in a 2024 dataset) would make one
    // key's grid span decades — fail loudly instead of exploding the job
    val hiChecked = when((col("__hi") - col("__lo")) / step <= maxBucketsPerKey, col("__hi"))
      .otherwise(raise_error(concat(
        lit(s"gapFill: key span exceeds $maxBucketsPerKey buckets: "),
        concat_ws(",", keys.map(col): _*))).cast("long"))
    val grid = df.groupBy(keys.map(col): _*)
      .agg(min(bucket).as("__lo"), max(bucket).as("__hi"))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), hiChecked, lit(step))).as("__bucket"): _*)

    val fillMap = fills.toMap
    val joined = grid.join(perBucket, keys :+ "__bucket", "left")
    joined.select(
      keys.map(col) ++ Seq(col("__bucket").as("bucket_start")) ++
        aggs.map { case (n, _) =>
          fillMap.get(n).map(f => coalesce(col(n), f).as(n)).getOrElse(col(n))
        }: _*)
  }
}
