package graft.quality

import graft.functions.Rounding.round6
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-drift observability — the check a pipeline runs BEFORE swapping
  * a corpus version into training: how far has the term distribution
  * moved between two snapshots (last week's crawl vs this week's, v1 vs
  * v2 of a release), and which terms moved it. Reports per-term smoothed
  * probabilities under the UNION vocabulary, the two directed KL
  * divergences and the symmetric Jensen–Shannon divergence, plus the
  * top-k terms by absolute JS contribution (the "what changed" readout —
  * a spam infestation or a source outage shows up here before it shows up
  * in a trained model).
  *
  * Probabilities are add-½ smoothed over the union vocabulary
  * (`p = (c + 0.5) / (total + 0.5·V)`), so terms absent from one side
  * stay finite and the divergences are always defined.
  *
  * Exactness contract ([[NgramLm]]'s convention): each term's divergence
  * contribution rounds to 6 decimals and totals fold as exact micro-longs
  * — order-independent, cross-engine reproducible — with [[round6]] doing
  * every final rounding (ln itself is libm; round6 of it has been the
  * gate-stable seam since q90).
  *
  * Scale shape: one count aggregation per corpus (map-side combined), a
  * full-outer join on the term key, two broadcast singleton stat frames;
  * nothing corpus-sized survives past the first aggregation.
  */
object Drift {

  /** Per-term table: `(term, ca, cb, pa, pb, kl_ab_c, kl_ba_c, js_c)` —
    * counts, smoothed probabilities, and the term's 6-dp-rounded
    * contribution to each divergence (KL contributions carry sign; a term
    * OVER-represented in `a` contributes positively to `kl_ab`).
    */
  def termTable(a: DataFrame, b: DataFrame, textCol: String): DataFrame =
    termTableFromCounts(counts(a, textCol), counts(b, textCol))

  /** Per-corpus term counts `(term, c)` — the PERSISTABLE half of drift:
    * at 100 TB the standing corpus is counted ONCE, written as parquet,
    * and every future comparison reads the vocab-sized table back instead
    * of rescanning the corpus ([[termTableFromCounts]] takes it directly).
    */
  def counts(df: DataFrame, textCol: String): DataFrame = df
    .select(explode(tokens(col(textCol))).as("term"))
    .groupBy("term").agg(count(lit(1)).as("c"))

  /** [[termTable]] from two pre-computed (possibly stored) count tables. */
  def termTableFromCounts(countsA: DataFrame, countsB: DataFrame): DataFrame = {
    val ca = countsA.select(col("term"), col("c").cast("long").as("ca"))
    val cb = countsB.select(col("term"), col("c").cast("long").as("cb"))
    val joined = ca.join(cb, Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val stats = joined.agg(sum("ca").as("__ta"), sum("cb").as("__tb"),
      count(lit(1)).as("__v"))
    val withP = joined.crossJoin(broadcast(stats))
      .withColumn("pa",
        (col("ca") + 0.5) / (col("__ta") + lit(0.5) * col("__v")))
      .withColumn("pb",
        (col("cb") + 0.5) / (col("__tb") + lit(0.5) * col("__v")))
      .withColumn("__m", (col("pa") + col("pb")) / 2.0)
    withP
      .withColumn("kl_ab_c", round6(col("pa") * log(col("pa") / col("pb"))))
      .withColumn("kl_ba_c", round6(col("pb") * log(col("pb") / col("pa"))))
      .withColumn("js_c", round6(
        (col("pa") * log(col("pa") / col("__m")) +
          col("pb") * log(col("pb") / col("__m"))) / 2.0))
      .drop("__ta", "__tb", "__v", "__m")
  }

  /** One-row summary: micro-exact folds of the per-term contributions plus
    * vocabulary/count accounting. `(kl_ab, kl_ba, js, n_terms, n_only_a,
    * n_only_b, tokens_a, tokens_b)`.
    */
  def summary(a: DataFrame, b: DataFrame, textCol: String): DataFrame =
    summaryFrom(termTable(a, b, textCol))

  /** [[summary]] over an existing [[termTable]] — reuse one table (cache
    * it) when a caller wants both the summary and [[topShiftsFrom]]; the
    * end-to-end form recounts both corpora per call.
    */
  def summaryFrom(tt: DataFrame): DataFrame = {
    def fold(c: String) = round6(
      sum(round(col(c) * 1e6, 0).cast("long")).cast("double") / 1e6)
    tt.agg(
      fold("kl_ab_c").as("kl_ab"), fold("kl_ba_c").as("kl_ba"),
      fold("js_c").as("js"), count(lit(1)).as("n_terms"),
      sum((col("cb") === 0L).cast("long")).as("n_only_a"),
      sum((col("ca") === 0L).cast("long")).as("n_only_b"),
      sum("ca").as("tokens_a"), sum("cb").as("tokens_b"))
  }

  /** The top-`k` terms by absolute JS contribution (ties broken by term) —
    * the human-readable "what moved" list.
    */
  def topShifts(a: DataFrame, b: DataFrame, textCol: String,
                k: Int = 20): DataFrame =
    topShiftsFrom(termTable(a, b, textCol), k)

  /** [[topShifts]] over an existing [[termTable]]. */
  def topShiftsFrom(tt: DataFrame, k: Int = 20): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    tt.select(col("term"), col("ca"), col("cb"),
        round6(col("pa")).as("pa6"), round6(col("pb")).as("pb6"),
        col("js_c"))
      .orderBy(abs(col("js_c")).desc, col("term").asc)
      .limit(k)
  }
}
