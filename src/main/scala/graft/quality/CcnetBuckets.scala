package graft.quality

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * partition each language's documents into head / middle / tail by
  * language-model score, so downstream mixing can oversample the fluent
  * head and drop or down-weight the tail. Composes with [[NgramLm]] —
  * higher mean bigram log-prob = more fluent = head.
  *
  * Two formulations with the same contract (`bucket` 1..n, 1 = best):
  *
  *   - [[exact]]: `ntile` over a fully tie-broken per-language window.
  *     Deterministic and engine-portable (standard SQL ntile split), but a
  *     window partition is ONE task — right for gates and modest corpora,
  *     wrong for a 100 TB language.
  *   - [[approx]]: per-language quantile THRESHOLDS from the mergeable KLL
  *     sketch (`graft_kll_quantiles`), broadcast back and bucketed by
  *     comparison — two corpus-wide aggregations, no single-partition
  *     window, the CCNet paper's own shape (it thresholds on quantiles of
  *     a sample, not a global sort). Bucket POPULATIONS can deviate from
  *     exact n/k by the sketch's rank error; bucket SEMANTICS (score
  *     ordering) are preserved.
  */
object CcnetBuckets {

  /** `(langCol, scoreCol, …) → + bucket` via per-language ntile.
    * Ties broken by `tieCol` so the split is deterministic.
    *
    * Fails loudly ([[graft.operators.Pca.MaxDim]]'s convention) when the
    * input exceeds `maxParts` partitions: each language's window is ONE
    * task regardless of input size, so a corpus-scale call must use
    * [[approx]]. Raise `maxParts` only for a deliberate measurement.
    */
  def exact(scored: DataFrame, langCol: String, scoreCol: String,
            tieCol: String, nBuckets: Int = 3,
            maxParts: Int = ExactPathMaxParts): DataFrame = {
    guardExactPath(scored, "CcnetBuckets.exact", "CcnetBuckets.approx", maxParts)
    val w = Window.partitionBy(langCol)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    scored.withColumn("bucket", ntile(nBuckets).over(w))
  }

  /** Partition cap above which the exact (single-task-per-window) paths
    * refuse to run — shared by [[Ensemble.percentileBlend]]. 256 input
    * partitions ≈ tens of GB of scan: far past any gate input, far short
    * of a corpus.
    */
  val ExactPathMaxParts = 256

  /** Loud guard for the exact formulations: a global-sort path applied to
    * a corpus-sized input should fail with an actionable message, not
    * grind one task for hours. The scale estimate is STATIC — read off the
    * optimized LOGICAL plan, never executed: `df.rdd` would go through
    * AdaptiveSparkPlanExec, which materializes every upstream query stage
    * (i.e. RUNS the input's shuffle jobs) just to finalize the plan — the
    * guard would execute a corpus-scale job to decide whether to refuse
    * one. Two job-free signals, max wins: explicit repartition counts in
    * the lineage, and leaf-scan bytes over `maxPartitionBytes` (file
    * listing only) — corpus-sized inputs come from corpus-sized scans.
    * Leaves whose stats are the UNKNOWN sentinel (`defaultSizeInBytes`,
    * e.g. an RDD-backed frame or a checkpoint) are excluded rather than
    * treated as infinite: a refusal the override cannot clear is worse
    * than trusting the remaining signals. The session's shuffle width is
    * deliberately NOT a signal — a corpus-tuned cluster running a
    * gate-sized input through the exact path is legitimate.
    */
  private[quality] def guardExactPath(df: DataFrame, what: String,
                                      alt: String, maxParts: Int): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val conf = df.sparkSession.sessionState.conf
    val plan = df.queryExecution.optimizedPlan
    val explicit = plan.collect {
      case r: Repartition => r.numPartitions.toLong
      case r: RepartitionByExpression =>
        r.optNumPartitions.getOrElse(0).toLong
    }
    val unknown = BigInt(conf.defaultSizeInBytes)
    val leafBytes = plan.collectLeaves().map(_.stats.sizeInBytes)
      .filter(_ < unknown).sum
    val leafParts =
      (leafBytes / BigInt(math.max(1L, conf.filesMaxPartitionBytes))).toLong + 1
    val n = (explicit :+ leafParts).max
    require(n <= maxParts,
      s"$what is the gate/modest-corpus formulation — its window collapses " +
      s"each partition key to ONE task and cannot scale to an input of ~$n " +
      s"partitions (cap $maxParts). Use $alt (the KLL-sketch scale path), " +
      "or raise maxParts for a deliberate measurement.")
  }

  /** Scale path: per-language KLL thresholds (k=200 sketch ⇒ ~1% rank
    * error), broadcast join, bucket = 1 + #thresholds the score is BELOW.
    * Descending semantics match [[exact]]: bucket 1 holds the top scores.
    */
  def approx(scored: DataFrame, langCol: String, scoreCol: String,
             nBuckets: Int = 3, sketchK: Int = 200): DataFrame = {
    require(nBuckets >= 2, s"nBuckets >= 2: $nBuckets")
    graft.GraftFunctions.register(scored.sparkSession)
    // descending buckets need the UPPER quantiles first: bucket b covers
    // scores in ((n-b)/n quantile, (n-b+1)/n quantile]
    val probs = array((1 until nBuckets).reverse
      .map(i => lit(i.toDouble / nBuckets)): _*)
    val thresholds = scored.groupBy(langCol)
      .agg(call_function("graft_kll_quantiles",
        col(scoreCol).cast("double"), probs, lit(sketchK)).as("__th"))
    scored.join(broadcast(thresholds), Seq(langCol))
      .withColumn("bucket",
        (lit(1) + aggregate(col("__th"), lit(0),
          (acc: Column, t: Column) => acc + when(col(scoreCol) < t, 1).otherwise(0)))
          .cast("int"))
      .drop("__th")
  }
}
