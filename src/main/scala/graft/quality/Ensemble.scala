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
  *     grid resolution (1/nProbes) and deviate from exact percent_rank by
  *     the sketch's ~1% rank error. The 100 TB path, same shape as
  *     [[CcnetBuckets.approx]].
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
                      maxParts: Int = CcnetBuckets.ExactPathMaxParts): DataFrame = {
    require(signals.nonEmpty, "at least one signal")
    CcnetBuckets.guardExactPath(df, "Ensemble.percentileBlend",
      "Ensemble.approxBlend", maxParts)
    val wTot = signals.map(_._2).sum
    require(wTot > 0, "weights must sum positive")
    val ranked = signals.foldLeft(df) { case (acc, (s, _)) =>
      acc.withColumn(s"__pr_$s",
        percent_rank().over(Window.orderBy(col(s).asc, col(tieCol).asc)))
    }
    val blend = signals.map { case (s, w) => col(s"__pr_$s") * lit(w) }
      .reduce(_ + _) / lit(wTot)
    ranked.withColumn("blended", round(blend, 6))
      .drop(signals.map(s => s"__pr_${s._1}"): _*)
  }

  /** Scale path: per-signal KLL thresholds at `nProbes` evenly spaced
    * quantiles; a value's normalized score is the fraction of thresholds
    * at or below it. No global sort; one broadcast threshold row.
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
      val frac = aggregate(col(s"__th_$s"), lit(0),
        (acc: Column, t: Column) => acc + when(col(s) >= t, 1).otherwise(0))
        .cast("double") / lit(nProbes.toDouble)
      frac * lit(w)
    }.reduce(_ + _) / lit(wTot)
    joined.withColumn("blended", round(blend, 6))
      .drop(signals.map(s => s"__th_${s._1}"): _*)
  }
}
