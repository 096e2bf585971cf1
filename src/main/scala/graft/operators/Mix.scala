package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixing quotas: cap each stratum (source, language, domain) of a
  * pretraining mix at a token budget — "web data at most N tokens, books
  * uncapped" — by admitting the stratum's rows in `orderCol` order until
  * the budget is reached. The admission rule matches [[Pack]]'s window
  * semantics: a doc is kept iff its tokens START under budget, so a
  * stratum can overrun by at most one document and admission is a pure
  * per-row predicate on the running sum.
  *
  * Deterministic: same `orderCol` order → same kept set. Order by an id
  * for take-first semantics, a quality score for best-first curation, or
  * a numeric hash coin of the id ([[graft.functions.TextFunctions.hashCoin]])
  * for an unbiased random-looking quota — the order key must be NUMERIC
  * (the range-slice boundaries come from percentile_approx, which rejects
  * strings), so a raw md5 hex string will not analyze.
  *
  * Scale shape: the running sum is [[Pack.runningTokens]] — range-sliced
  * parallel prefix sums, never one unsplittable task per stratum; the
  * budget table is strata-sized and broadcasts.
  */
object Mix {

  /** Keep each stratum's prefix (by `orderCol`) whose running `weightCol`
    * stays under that stratum's budget. `budgets` is `(strataCol, budget)`
    * — strata absent from it are kept in full (no quota).
    */
  def capTokens(df: DataFrame, strataCol: String, orderCol: String,
                weightCol: String, budgets: DataFrame,
                subStrata: Int = 32): DataFrame = {
    val b = budgets.select(col(strataCol),
      col("budget").cast("long").as("__budget"))
    Pack.runningTokens(df, strataCol, orderCol, weightCol, subStrata)
      .join(broadcast(b), Seq(strataCol), "left")
      .where(col("__budget").isNull ||
        col("cum") - col(weightCol).cast("long") < col("__budget"))
      .drop("cum", "__budget")
  }

  /** Temperature-scaled mixing weights (the multilingual/data-mix α-sampling
    * rule, cf. XLM-R / mT5: `p_s ∝ n_s^α`): α = 1 reproduces natural
    * proportions, α → 0 flattens toward uniform, so low-resource strata are
    * up-sampled without hand-tuned ratios. Returns one row per stratum —
    * `(strataCol, n_tokens, p, budget)` — where `budget = ⌊totalBudget·p_s⌋`
    * is the stratum's token quota for one epoch; feed it straight to
    * [[capTokens]] (or sample with replacement for α-upsampled strata whose
    * quota exceeds their supply).
    *
    * Scale shape: one hash aggregation to strata size, then a
    * single-partition window for the normalizer — the strata table is
    * small by definition. BOUNDED-CARDINALITY CONTRACT: `strataCol` is a
    * grouping dimension (source / language / domain — tens to low
    * thousands of values); the normalizer window deliberately serializes
    * the strata-sized fold through one task, which is the right plan at
    * that cardinality but would bottleneck if a caller passed a
    * document-grained column. Callers with >~10^5 strata should
    * pre-bucket the dimension, not widen this window.
    *
    * Determinism contract: `n_s^α` is quantized to MICRO-units
    * (`round(pw·1e6)` as an integer) before the normalizer sum, and the
    * sum runs over decimals — exact and association-order-independent —
    * so `p` and the `floor(p·total)` boundaries cannot drift with
    * partition count or engine summation order. (A raw double `SUM(pw)`
    * has no fixed association order; a one-ulp difference in the total
    * can flip a floor boundary.) The per-stratum quantization itself is
    * deterministic at any magnitude; `exp`-free α values (1.0, 0.5) are
    * additionally bit-identical cross-engine, while libm-pow α values
    * (e.g. 0.3) stay deterministic per engine but may differ across
    * engines by ±1 micro-unit — gate those like q113 does, on the
    * stable downstream slice.
    */
  def temperatureBudgets(df: DataFrame, strataCol: String, weightCol: String,
                         alpha: Double, totalBudget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1]: $alpha")
    // the normalizer is a WINDOW over the strata-sized fold, not a second
    // aggregation of it: perStratum previously fed both the output and a
    // crossJoin'd total, and each consumer re-folded the corpus — every
    // caller paid two full scans for one strata-sized table (observed in
    // q110's physical plan). The single-partition window holds K strata
    // rows (the FilterFunnel dim-frame pattern), consumes the fold once,
    // and stays lazy
    val perStratum = df.groupBy(strataCol)
      .agg(sum(col(weightCol).cast("long")).as("n_tokens"))
      .withColumn("__pwm",
        round(pow(col("n_tokens").cast("double"), lit(alpha)) * 1e6, 0)
          .cast("decimal(28,0)"))
    perStratum
      .withColumn("__tot", sum("__pwm").over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("p", round(
        col("__pwm").cast("double") / col("__tot").cast("double"), 6))
      .withColumn("budget",
        floor(col("__pwm").cast("double") / col("__tot").cast("double")
          * totalBudget).cast("long"))
      .drop("__pwm", "__tot")
  }

  /** With-replacement upsampling to a token budget — the other half of the
    * α-sampling story: when [[temperatureBudgets]] hands a low-resource
    * stratum a quota ABOVE its supply, the stratum repeats in whole
    * `orderCol` cycles (`epoch` 0, 1, 2, …) until the budget is met, the
    * mT5/XLM-R behavior. Strata whose budget fits their supply reduce
    * exactly to [[capTokens]] (an epoch-0 prefix); strata absent from
    * `budgets` are kept once, uncapped. Output adds an `epoch` column
    * (0-based replica index) — dedup-sensitive consumers can tell copies
    * apart, and `(epoch, orderCol)` is the replicated stream order.
    *
    * Scale shape: the running sum is computed ONCE over the base corpus
    * ([[Pack.runningTokens]]); a replica's position is then the pure
    * per-row expression `epoch·total + cum`, so replication is one
    * `explode(sequence(...))` with no window over the replicated stream.
    * Output volume is budget-bounded: ~budget/avgDocTokens rows per
    * stratum regardless of the epoch count.
    */
  def upsampleTokens(df: DataFrame, strataCol: String, orderCol: String,
                     weightCol: String, budgets: DataFrame,
                     subStrata: Int = 32, maxEpochs: Long = 100L): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs >= 1: $maxEpochs")
    val b = budgets.select(col(strataCol), col("budget").cast("long").as("__budget"))
    val tot = df.groupBy(strataCol)
      .agg(sum(col(weightCol).cast("long")).as("__tot"))
    // epoch count is CLAMPED at maxEpochs — the UniMax convention (Chung
    // et al. 2023): a quota orders of magnitude above a stratum's supply
    // means catastrophic repetition, not more signal, and an unclamped
    // count would also materialize a ceil(budget/supply)-element epoch
    // array per row before the explode (an OOM for a 10-token stratum
    // handed a 10^9-token quota). Raise maxEpochs deliberately if a
    // heavier repeat is really wanted; the per-row array is maxEpochs
    // longs at worst.
    Pack.runningTokens(df, strataCol, orderCol, weightCol, subStrata)
      .join(broadcast(tot), Seq(strataCol))
      .join(broadcast(b), Seq(strataCol), "left")
      .withColumn("__ne",
        when(col("__budget").isNull || col("__tot") <= 0, lit(1L))
          .otherwise(least(lit(maxEpochs), greatest(
            // integer DIV ceil, matching audit(): double ceil rounds
            // wrong past 2^53 and the delivered epochs would disagree
            // with the audited epochs
            expr("(__budget + __tot - 1) DIV __tot"),
            lit(1L)))))
      .withColumn("epoch", explode(sequence(lit(0L), col("__ne") - 1)))
      .where(col("__budget").isNull ||
        col("epoch") * col("__tot") + col("cum") - col(weightCol).cast("long")
          < col("__budget"))
      .drop("cum", "__tot", "__budget", "__ne")
  }

  /** Data-constrained mixing audit (the accounting inputs of Muennighoff
    * et al. 2023, "Scaling Data-Constrained Language Models"): per
    * stratum, the temperature budget, the epoch count that budget implies
    * (UniMax-clamped exactly like [[upsampleTokens]]), and the
    * unique/repeated token split actually delivered — the table a mix
    * designer reads BEFORE committing a run to catastrophic repetition.
    * Pure strata-sized derivation on [[temperatureBudgets]]' output; no
    * corpus pass beyond the one aggregation that already does. Integer
    * ceil via DIV (exact past 2^53, where double ceil is not).
    */
  def audit(df: DataFrame, strataCol: String, weightCol: String,
            alpha: Double, totalBudget: Long,
            maxEpochs: Long = 100L): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs >= 1: $maxEpochs")
    temperatureBudgets(df, strataCol, weightCol, alpha, totalBudget)
      .withColumn("epochs",
        when(col("n_tokens") <= 0L, lit(1L)).otherwise(least(lit(maxEpochs),
          greatest(expr("(budget + n_tokens - 1) DIV n_tokens"), lit(1L)))))
      .withColumn("delivered_tokens",
        least(col("budget"), col("epochs") * col("n_tokens")))
      .withColumn("unique_tokens", least(col("n_tokens"), col("budget")))
      .withColumn("repeated_tokens",
        col("delivered_tokens") - col("unique_tokens"))
      .withColumn("unique_frac",
        when(col("delivered_tokens") === 0L, lit(1.0)).otherwise(
          round(col("unique_tokens").cast("double") /
            col("delivered_tokens"), 6)))
  }

  /** Excess-loss domain reweighting — the one-shot approximation of DoReMi
    * (Xie et al. 2023, arXiv:2305.10429): domains where a reference model
    * beats the proxy model hardest (largest positive excess loss) get
    * up-weighted by an exponential tilt, `p_d ∝ exp(η · excess_d)`.
    * `perDoc` carries a per-doc loss under the proxy model (`lossCol`) and
    * under the reference model (`refLossCol`); `excess_d` is the per-domain
    * mean of `max(0, loss − refLoss)` (negative excess is clipped — a
    * domain the proxy already fits gains nothing from more weight, the
    * paper's clamp). `smoothing` mixes the tilt with uniform,
    * `p = (1−s)·tilt + s/K` — DoReMi's uniform-smoothing knob.
    *
    * One-shot vs the paper: full DoReMi re-trains the proxy under
    * Group-DRO and updates weights every step; this computes the tilt ONCE
    * from two fixed models (e.g. [[graft.quality.NgramLm]] trained on the
    * full mix vs on the reference corpus) — the corpus-pipeline-shaped
    * slice of the recipe. Iterating it is the caller's loop: re-train,
    * re-score, re-call.
    *
    * Exactness contract: `lossCol`/`refLossCol` must be 6-dp-quantized
    * doubles (e.g. [[graft.quality.NgramLm.scoreAvgLogProb]] output, or
    * anything passed through `Rounding.round6`); per-doc excess folds as
    * exact micro-longs and `mean_excess` applies the IEEE-exact floor-form
    * rounding, so the `(strata, n_docs, mean_excess)` slice is bit-exact
    * cross-engine. The tilt is MICRO-QUANTIZED (`round(exp·1e6)` summed as
    * exact decimals, [[temperatureBudgets]]' convention), so `p`/`budget`
    * are deterministic per engine at any partition count; across engines
    * they still ride libm `exp` (±1 micro-unit at worst where two libms
    * disagree near a rounding boundary) — hash-gate them only after
    * checking the engines agree on the data, else gate with invariant
    * booleans, q118-style.
    *
    * Scale shape: one hash aggregation folds the corpus to strata size;
    * the tilt normalizer is a single-partition window over that fold.
    * Same bounded-cardinality contract as [[temperatureBudgets]]:
    * `strataCol` is a domain-grained dimension, and the normalizer
    * window serializes the strata-sized fold through one task — correct
    * for DoReMi's dozens of domains, wrong for a document-grained key.
    */
  def excessLossBudgets(perDoc: DataFrame, strataCol: String,
                        lossCol: String, refLossCol: String, eta: Double,
                        totalBudget: Long, smoothing: Double = 0.0): DataFrame = {
    require(eta > 0, s"eta > 0: $eta")
    require(smoothing >= 0 && smoothing <= 1, s"smoothing in [0,1]: $smoothing")
    val excessMicro = greatest(
      round(col(lossCol) * 1e6, 0).cast("long") -
        round(col(refLossCol) * 1e6, 0).cast("long"), lit(0L))
    val perStratum = perDoc
      .select(col(strataCol), excessMicro.as("__em"))
      .groupBy(strataCol)
      .agg(count(lit(1)).as("n_docs"), sum("__em").as("__sum"))
      .withColumn("mean_excess", graft.functions.Rounding.round6(
        col("__sum").cast("double") / 1e6 / col("n_docs")))
      .withColumn("__tiltm",
        round(exp(lit(eta) * col("mean_excess")) * 1e6, 0)
          .cast("decimal(28,0)"))
    // same single-partition-window normalizer as [[temperatureBudgets]]:
    // a crossJoin'd re-aggregation would re-fold the whole per-doc loss
    // frame a second time; the window consumes the strata-sized fold once
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perStratum
      .withColumn("__tot", sum("__tiltm").over(wAll))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("p",
        (lit(1.0 - smoothing) * col("__tiltm").cast("double") /
          col("__tot").cast("double")) + (lit(smoothing) / col("__k")))
      .withColumn("budget", floor(col("p") * totalBudget).cast("long"))
      .drop("__em", "__sum", "__tiltm", "__tot", "__k")
  }

  /** Annealed mix schedule — phase-interpolated quotas between two full-run
    * allocations (the quality-annealing / midtraining recipe: train most of
    * the run near natural proportions, shift toward a quality- or
    * temperature-tilted mix for the final phases). `start` and `end` are
    * `(strataCol, budget)` allocations of the SAME total (e.g. two
    * [[temperatureBudgets]] calls at different α, or natural vs
    * [[excessLossBudgets]]); phase `i` of `nPhases` gets
    * `⌊(start·(K−1−i) + end·i) / ((K−1)·K)⌋` tokens — the linear
    * interpolation of the two mixes, with each phase sized 1/K of the run.
    * All integer DIV arithmetic (exact past 2^53, the [[audit]]
    * convention); strata missing from one side interpolate from 0. Feed
    * each phase's rows to [[capTokens]] / [[upsampleTokens]].
    */
  def schedule(start: DataFrame, end: DataFrame, strataCol: String,
               nPhases: Int): DataFrame = {
    require(nPhases >= 2, s"nPhases >= 2: $nPhases")
    // the output owns these two names; a strata column called "phase"
    // would be silently overwritten and one called "budget" would be
    // shadowed by the interpolated quota — fail loudly instead
    require(strataCol != "phase" && strataCol != "budget",
      s"strataCol must not be named 'phase' or 'budget' (got '$strataCol') — " +
        "those are schedule()'s output columns; alias the strata column first")
    val s = start.select(col(strataCol), col("budget").cast("long").as("__s"))
    val e = end.select(col(strataCol), col("budget").cast("long").as("__e"))
    val k = nPhases.toLong
    s.join(e, Seq(strataCol), "full_outer")
      .select(col(strataCol), coalesce(col("__s"), lit(0L)).as("__s"),
        coalesce(col("__e"), lit(0L)).as("__e"))
      .withColumn("phase", explode(sequence(lit(0L), lit(k - 1))))
      .withColumn("budget", expr(
        s"(__s * (${k - 1} - phase) + __e * phase) DIV ${(k - 1) * k}"))
      .drop("__s", "__e")
  }

  /** Deterministic round-robin interleave across strata for training
    * order: adds `pos` = this row's 1-based rank within its stratum (by
    * `orderCol`); sorting the output by `(pos, strataCol)` yields an epoch
    * where every stratum appears once per cycle — source-balanced batches
    * without a global shuffle of the corpus. The rank is
    * [[Pack.runningTokens]] with unit weight, i.e. range-sliced parallel
    * row numbering — never one unsplittable sort task per stratum.
    */
  def interleave(df: DataFrame, strataCol: String, orderCol: String,
                 subStrata: Int = 32): DataFrame =
    Pack.runningTokens(
        df.withColumn("__one", lit(1L)), strataCol, orderCol, "__one", subStrata)
      .withColumnRenamed("cum", "pos")
      .drop("__one")
}
