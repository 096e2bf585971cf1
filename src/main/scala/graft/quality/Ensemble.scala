package graft.quality

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Ensemble quality scoring — blend several per-document quality signals
  * (LM log-prob, repetition fractions, length/stopword heuristics,
  * classifier scores) into one rank by PERCENTILE-normalizing each signal
  * first, so signals with incomparable units and spreads contribute
  * equally (the FineWeb/RefinedWeb-style multi-signal filter: no single
  * heuristic decides, the consensus does).
  *
  * Two formulations, same contract (`blended` in [0, 1], higher = better):
  *
  *   - [[percentileBlend]]: exact `percent_rank` per signal over a fully
  *     tie-broken global order, then the weighted mean. One window per
  *     signal with NO partition key — a single sort task per signal: the
  *     gate/modest-corpus path, wrong for a 100 TB corpus.
  *   - [[approxBlend]]: each signal normalized against its KLL quantile
  *     sketch (`graft_kll_quantiles` at a probe grid) — two corpus-wide
  *     aggregations total, no global sort; normalized values step at the
  *     grid resolution (1/nProbes) and deviate from the exact rank by the
  *     sketch's ~1% rank error. The 100 TB path, same shape as
  *     [[CcnetBuckets.approx]].
  *
  * Ties: real quality signals are tie-heavy (integer token counts,
  * saturated heuristics), and the two paths treat a tie group differently
  * by nature — `percent_rank` SPREADS it across its rank range via the
  * tie-break column, while a threshold comparison scores the whole group
  * as one block. [[approxBlend]] therefore uses the MIDRANK convention
  * (average of the ≤ and < threshold counts), the standard CDF estimate
  * at an atom, and converges to [[percentileBlend]]'s `tieAverage = true`
  * variant; against the default fully-tie-broken exact blend its drift is
  * bounded below by half the largest tie mass, which is a property of the
  * data, not of the sketch.
  *
  * Signals where LOWER is better (perplexity, repetition fraction) should
  * be passed negated; weights need not sum to 1 (the mean divides by the
  * weight total).
  */
object Ensemble {

  /** Exact path: `df` plus `blended` = Σ wᵢ·percent_rank(sᵢ) / Σ wᵢ,
    * rounded to 6 decimals. `tieCol` fully orders ties so the result is
    * deterministic and engine-portable.
    *
    * Fails loudly when the input exceeds `maxParts` partitions: N signals
    * mean N sequential UNPARTITIONED `percent_rank` windows — N global
    * sorts each collapsing to one task — so a corpus-scale call must use
    * [[approxBlend]]. Raise `maxParts` only for a deliberate measurement.
    */
  def percentileBlend(df: DataFrame, signals: Seq[(String, Double)],
                      tieCol: String,
                      maxParts: Int = CcnetBuckets.ExactPathMaxParts,
                      tieAverage: Boolean = false): DataFrame = {
    require(signals.nonEmpty, "at least one signal")
    CcnetBuckets.guardExactPath(df, "Ensemble.percentileBlend",
      "Ensemble.approxBlend", maxParts)
    val wTot = signals.map(_._2).sum
    require(wTot > 0, "weights must sum positive")
    // tieAverage = true replaces each tie group's spread of tie-broken
    // ranks with their mean (the midrank CDF estimate) — the exact answer
    // [[approxBlend]] converges to; one extra per-value window per signal
    val ranked = signals.foldLeft(df) { case (acc, (s, _)) =>
      val withPr = acc.withColumn(s"__pr_$s",
        percent_rank().over(Window.orderBy(col(s).asc, col(tieCol).asc)))
      if (tieAverage)
        withPr.withColumn(s"__pr_$s",
          avg(col(s"__pr_$s")).over(Window.partitionBy(col(s))))
      else withPr
    }
    val blend = signals.map { case (s, w) => col(s"__pr_$s") * lit(w) }
      .reduce(_ + _) / lit(wTot)
    ranked.withColumn("blended", round(blend, 6))
      .drop(signals.map(s => s"__pr_${s._1}"): _*)
  }

  /** Scale path: per-signal KLL thresholds at `nProbes` evenly spaced
    * quantiles; a value's normalized score is the MIDRANK fraction of
    * thresholds — the mean of the ≤-count and the <-count — so a value
    * sitting on a fat tie atom scores at the middle of the atom's rank
    * range (the standard CDF-at-an-atom convention) instead of its top.
    * No global sort; one broadcast threshold row.
    */
  def approxBlend(df: DataFrame, signals: Seq[(String, Double)],
                  nProbes: Int = 100, sketchK: Int = 200): DataFrame = {
    require(signals.nonEmpty, "at least one signal")
    require(nProbes >= 2, s"nProbes >= 2: $nProbes")
    val wTot = signals.map(_._2).sum
    require(wTot > 0, "weights must sum positive")
    graft.GraftFunctions.register(df.sparkSession)
    val probs = array((1 to nProbes).map(i =>
      lit(i.toDouble / (nProbes + 1))): _*)
    val th = df.agg(
      signals.map { case (s, _) =>
        call_function("graft_kll_quantiles",
          col(s).cast("double"), probs, lit(sketchK)).as(s"__th_$s")
      }.head, signals.drop(1).map { case (s, _) =>
        call_function("graft_kll_quantiles",
          col(s).cast("double"), probs, lit(sketchK)).as(s"__th_$s")
      }: _*)
    val joined = df.crossJoin(broadcast(th))
    val blend = signals.map { case (s, w) =>
      // midrank: (#{t <= v} + #{t < v}) / 2 — a single fold accumulating
      // both counts (2 per strictly-below threshold, 1 per equal)
      // NaN counts as above every threshold — Spark's sort order places
      // NaN greater than all doubles, so the exact percentileBlend ranks
      // a NaN signal at the top; folding it to 0 here would rank the
      // same document at opposite extremes on the two paths. (Nulls
      // score 0 on both: percent_rank sorts nulls first.)
      val frac = aggregate(col(s"__th_$s"), lit(0),
        (acc: Column, t: Column) => acc +
          when(isnan(col(s).cast("double")) || col(s) > t, 2)
            .when(col(s) === t, 1).otherwise(0))
        .cast("double") / lit(2.0 * nProbes)
      frac * lit(w)
    }.reduce(_ + _) / lit(wTot)
    joined.withColumn("blended", round(blend, 6))
      .drop(signals.map(s => s"__th_${s._1}"): _*)
  }
}
