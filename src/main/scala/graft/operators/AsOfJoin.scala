package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

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
  * sides hash-partition by key; no driver state, no broadcast needed. Note
  * AQE's skew handling splits JOIN partitions, not window partitions: a hot
  * key is one unsplittable sort task here — use [[latestPriorSliced]], which
  * time-slices each key and stitches slices with a carry pass, when one key
  * dominates.
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

  private final case class Tagged(union: DataFrame, payload: Seq[String],
                                  leftRest: Seq[String],
                                  rightTypes: Map[String, DataType])

  /** Shared prep: validate names, tag both sides, union. Side 0 = right,
    * 1 = left: at an equal timestamp the right row sorts first, so the
    * running last() sees it — `<=` semantics. */
  private def tag(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String): Tagged = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val leftRest = left.columns.filterNot(keys.contains).toSeq
    // the output appends `asof_<payload>` columns — they must not collide
    // with names the left frame already has
    val clash = payload.map("asof_" + _).intersect(left.columns.toSeq)
    require(clash.isEmpty, s"output columns would collide: ${clash.mkString(",")}")
    // the union carries internal __ts/__side/__r_* tag columns; same-named
    // inputs would silently corrupt the running-last semantics
    val reserved = (left.columns ++ right.columns).filter(c =>
      c == "__ts" || c == "__side" || c == "__slice" || c.startsWith("__r_")).distinct
    require(reserved.isEmpty,
      s"input columns use reserved internal names: ${reserved.mkString(",")}")

    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

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
    Tagged(taggedLeft.unionByName(taggedRight), payload, leftRest, rightTypes)
  }

  /** Tolerance + restore the left frame's column order, payload appended. */
  private def finish(matched: DataFrame, left: DataFrame, leftTs: String,
                     rightTs: String, payload: Seq[String],
                     rightTypes: Map[String, DataType],
                     tolerance: Option[Long]): DataFrame = {
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
    bounded.select(
      left.columns.map(c => if (c == leftTs) col("__ts").as(leftTs) else col(c)) ++
        payload.map(p => col(s"asof_$p")): _*)
  }

  def latestPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  tolerance: Option[Long] = None): DataFrame = {
    val t = tag(left, right, keys, leftTs, rightTs)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = t.union
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__side")) ++
          t.leftRest.map(col) ++
          t.payload.map(p => last(col(s"__r_$p"), ignoreNulls = true).over(w)
            .as(s"asof_$p")): _*)
      .where(col("__side") === 1)

    finish(matched, left, leftTs, rightTs, t.payload, t.rightTypes, tolerance)
  }

  /** Skew-safe as-of join: identical semantics to [[latestPrior]], but each
    * key's timeline is cut into `sliceWidth`-wide slices so a hot key becomes
    * `span/sliceWidth` parallel window tasks instead of ONE unsplittable
    * sort. Classic two-pass prefix scan:
    *
    *   1. running last per `(keys, slice)` — the parallel local pass;
    *   2. per-slice summary (last non-null payload of each slice) → a
    *      running carry over slices per key — a window over ONE ROW PER
    *      POPULATED SLICE, thousands of times smaller than the data;
    *   3. stitch: `coalesce(local, carry)` via an equi join back on
    *      `(keys, slice)` that reuses the pass-1 partitioning (AQE
    *      broadcasts the summary side when it is small).
    *
    * Cost vs [[latestPrior]]: same one big shuffle (now on
    * `(keys, slice)`), plus a tiny summary window and a broadcast-able join.
    * Pick `sliceWidth` so a hot key's densest slice fits one task (e.g. one
    * hour of nanos for a key with years of data).
    */
  def latestPriorSliced(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTs: String, rightTs: String, sliceWidth: Long,
                        tolerance: Option[Long] = None): DataFrame = {
    require(sliceWidth > 0, s"sliceWidth must be positive, got $sliceWidth")
    val t = tag(left, right, keys, leftTs, rightTs)

    // exact integer floor-slice (matches BandJoin's exact bucketing: double
    // division of int64 nanos would mis-slice boundary rows)
    val sliced = t.union.withColumn("__slice",
      expr(s"(__ts - pmod(__ts, ${sliceWidth}L)) div ${sliceWidth}L"))

    val sliceKeys = keys :+ "__slice"
    val wLocal = Window.partitionBy(sliceKeys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val localPass = sliced.select(
      (sliceKeys.map(col) :+ col("__ts") :+ col("__side")) ++
        t.leftRest.map(col) ++
        t.payload.map(p => last(col(s"__r_$p"), ignoreNulls = true).over(wLocal)
          .as(s"__loc_$p")): _*)

    // one summary row per populated (key, slice) — left-only slices included,
    // with null slice-last values, so every left row finds its carry row.
    // max_by ignores rows whose ordering expr is null, i.e. left rows and
    // null-payload right rows — per-column last-non-null, same as the window.
    val summary = sliced.groupBy(sliceKeys.map(col): _*)
      .agg(
        max_by(col(s"__r_${t.payload.head}"),
          when(col(s"__r_${t.payload.head}").isNotNull, col("__ts")))
          .as(s"__sl_${t.payload.head}"),
        t.payload.tail.map(p =>
          max_by(col(s"__r_$p"), when(col(s"__r_$p").isNotNull, col("__ts")))
            .as(s"__sl_$p")): _*)

    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = summary.select(
      sliceKeys.map(col) ++
        t.payload.map(p => last(col(s"__sl_$p"), ignoreNulls = true).over(wCarry)
          .as(s"__carry_$p")): _*)

    // no forced broadcast: summary size is keys×slices (unbounded at 100 TB);
    // AQE broadcasts it when it is actually small, and the equi join reuses
    // the pass-1 (keys, slice) partitioning otherwise
    val matched = localPass
      .join(carry, sliceKeys)
      .where(col("__side") === 1)
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__side")) ++
          t.leftRest.map(col) ++
          t.payload.map(p =>
            coalesce(col(s"__loc_$p"), col(s"__carry_$p")).as(s"asof_$p")): _*)

    finish(matched, left, leftTs, rightTs, t.payload, t.rightTypes, tolerance)
  }
}
