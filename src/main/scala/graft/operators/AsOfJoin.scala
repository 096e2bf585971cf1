package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the single latest right
  * row whose timestamp is `<=` the left row's, within the same key group —
  * the time-series alignment primitive wearable pipelines need (e.g. "the
  * last reported heart-rate sample at or before each sleep-log timestamp";
  * the reference's intraday samples are exactly such series, see
  * `/root/reference/src/glue/resources/table_columns.yaml:521-561`).
  *
  * Spark-first plan: a range join would explode (`O(n·m)` candidate pairs) or
  * need a custom strategy; instead both sides are tagged and UNIONed, and a
  * running `last(_, ignoreNulls)` window over `(keys) ORDER BY (ts, side)`
  * picks each left row's most recent right predecessor. Cost = ONE shuffle on
  * the keys + a single sort pass per partition — the same plan shape
  * sort-merge join would pick, with no candidate blowup. At 100 TB both
  * sides hash-partition by key; no driver state, no broadcast needed, AQE
  * can still split a skewed key's sort.
  *
  * Contract: `right` must be unique per `(keys, rightTs)` (pre-aggregate
  * ties first — asof semantics are undefined under right-side ties);
  * timestamps are numeric (e.g. epoch nanos). Right rows at exactly the left
  * timestamp DO match (`<=`), mirroring DuckDB/pandas `ASOF JOIN` backward
  * semantics. Left rows with no predecessor keep null payloads (left-outer
  * flavor); filter them for inner-asof.
  *
  * Output: all left columns, plus each non-key right column prefixed
  * `asof_`. `tolerance` (same unit as the timestamps) nulls out matches
  * older than `leftTs - tolerance`.
  */
object AsOfJoin {

  def latestPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  tolerance: Option[Long] = None): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val leftRest = left.columns.filterNot(keys.contains).toSeq
    // the output appends `asof_<payload>` columns — they must not collide
    // with names the left frame already has
    val clash = payload.map("asof_" + _).intersect(left.columns.toSeq)
    require(clash.isEmpty, s"output columns would collide: ${clash.mkString(",")}")

    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    // side 0 = right, 1 = left: at an equal timestamp the right row sorts
    // first, so the running last() sees it — `<=` semantics
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftRest.map(col) ++
        payload.map(p => lit(null).cast(rightTypes(p)).as(s"__r_$p")): _*)
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftRest.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        payload.map(p => col(p).as(s"__r_$p")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedLeft.unionByName(taggedRight)
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__side")) ++
          leftRest.map(col) ++
          payload.map(p => last(col(s"__r_$p"), ignoreNulls = true).over(w)
            .as(s"asof_$p")): _*)
      .where(col("__side") === 1)

    val bounded = tolerance match {
      case Some(tol) =>
        val inRange = col(s"asof_$rightTs").isNotNull &&
          col("__ts") - col(s"asof_$rightTs") <= tol
        payload.foldLeft(matched) { (df, p) =>
          df.withColumn(s"asof_$p",
            when(inRange, col(s"asof_$p")).otherwise(lit(null).cast(rightTypes(p))))
        }
      case None => matched
    }

    // restore the left frame's column order, matched payload appended
    bounded.select(
      left.columns.map(c => if (c == leftTs) col("__ts").as(leftTs) else col(c)) ++
        payload.map(p => col(s"asof_$p")): _*)
  }
}
