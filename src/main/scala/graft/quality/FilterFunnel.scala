package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass attrition report for an ORDERED quality-filter chain — the
  * per-rule funnel table every corpus release publishes (how many documents
  * and tokens each rule removed, in chain order), with first-failing-rule
  * attribution: a document counts against the FIRST rule that rejects it,
  * the semantics of actually running the rules sequentially.
  *
  * The naive build applies rule 1, counts, applies rule 2 to the survivors,
  * counts, … — K passes over a 100 TB corpus. Here the first-failing index
  * is ONE sequential `CASE` chain per document (evaluation stops at the
  * first failing rule, so later rules never see documents an earlier rule
  * rejected — a later rule may therefore safely assume the earlier rules'
  * guards, e.g. divide by a token count a min-tokens rule already proved
  * nonzero), the corpus folds into at most K+1 rows by that index, and the
  * funnel arithmetic (prefix sums, survivor counts) runs on the K-row
  * frame. One scan, one K-row shuffle; the sweep never re-reads text.
  *
  * Complementary to [[FilterSweep]]: the sweep ablates ONE metric over a
  * threshold grid to pick a cutoff; the funnel attributes attrition across
  * the HETEROGENEOUS rule chain a release actually ships.
  */
object FilterFunnel {

  /** The funnel table for `rules` applied in order to `docs`. A rule keeps
    * a document iff its predicate evaluates to TRUE — null (e.g. a
    * comparison against a null column) rejects, the conservative release
    * semantics. A null `weight` contributes zero to the token columns
    * (SQL sum-skips-null) while the document still counts in `n_*` —
    * coalesce upstream if null weight should mean something else.
    *
    * Output, one row per rule in chain order: documents and `weight` mass
    * (e.g. token counts) reaching the rule (`n_in`/`tokens_in`), removed
    * by it (`n_removed`/`tokens_removed`), surviving it
    * (`n_out`/`tokens_out`), and `frac_docs_removed` (6 dp, null when
    * nothing reached the rule). The last rule's `n_out` is the released
    * corpus.
    */
  def funnel(docs: DataFrame, rules: Seq[(String, Column)],
             weight: Column): DataFrame = {
    require(rules.nonEmpty, "funnel needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1).mkString(", ")}")
    val spark = docs.sparkSession
    import spark.implicits._
    val k = rules.length
    // first failing rule index, k = survived the whole chain; CaseWhen
    // evaluates branches sequentially, so rule i never evaluates on a
    // document rule j < i rejected
    val failIdx = rules.zipWithIndex.foldRight(lit(k): Column) {
      case (((_, keep), i), acc) =>
        when(!coalesce(keep, lit(false)), lit(i)).otherwise(acc)
    }
    // byFail is consumed twice below (the dim join and the totals). The
    // STATIC plan therefore shows two corpus scans, but the runtime plan
    // does not repeat the fold: both consumers sit on the identical
    // groupBy exchange and Spark's ReuseExchange (on by default, AQE or
    // not) computes it once — an eager checkpoint here was A/B'd and
    // measured strictly SLOWER (one extra job + materialization for a
    // fold the engine already shares; design note 103)
    val byFail = docs
      .select(failIdx.as("__f"), weight.cast("long").as("__w"))
      .groupBy("__f")
      .agg(count(lit(1)).as("__n"), sum("__w").as("__t"))
    // everything below runs on <= k+1 rows: broadcast totals, K-row
    // dimension join, single-partition prefix window — all funnel-sized
    val totals = byFail.agg(
      coalesce(sum("__n"), lit(0L)).as("__tot_n"),
      coalesce(sum("__t"), lit(0L)).as("__tot_t"))
    val dim = rules.zipWithIndex.map { case ((n, _), i) => (i, n) }
      .toDF("rule_idx", "rule")
    val w = Window.orderBy("rule_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.join(byFail, col("rule_idx") === col("__f"), "left")
      .select(col("rule_idx"), col("rule"),
        coalesce(col("__n"), lit(0L)).as("n_removed"),
        coalesce(col("__t"), lit(0L)).as("tokens_removed"))
      .withColumn("__cum_n", sum("n_removed").over(w))
      .withColumn("__cum_t", sum("tokens_removed").over(w))
      .crossJoin(broadcast(totals))
      .select(col("rule_idx"), col("rule"),
        (col("__tot_n") - col("__cum_n") + col("n_removed")).as("n_in"),
        col("n_removed"),
        (col("__tot_n") - col("__cum_n")).as("n_out"),
        (col("__tot_t") - col("__cum_t") + col("tokens_removed"))
          .as("tokens_in"),
        col("tokens_removed"),
        (col("__tot_t") - col("__cum_t")).as("tokens_out"))
      .withColumn("frac_docs_removed",
        when(col("n_in") > 0,
          round(col("n_removed").cast("double") / col("n_in"), 6)))
      .orderBy("rule_idx")
  }
}
