package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass quality-filter threshold ablation: how much of the corpus (docs
  * and tokens) survives each candidate cutoff. Choosing a filter threshold
  * is an iterative, human-in-the-loop step of every training-data build;
  * the naive loop re-scans the corpus per candidate — K thresholds, K full
  * 100 TB reads. Here the per-document metric is computed ONCE and crossed
  * with a broadcast literal grid, so the corpus is read once, the docs×K
  * expansion is map-side (broadcast nested-loop feeding a partial
  * aggregate), and the only shuffle is K result rows.
  *
  * The same shape extends to any per-doc metric (length, lang-id
  * confidence, perplexity, classifier score): pass the metric/weight
  * columns; the sweep itself never looks at text.
  */
object FilterSweep {

  /** Survival curve over `grid` (index, threshold) cutoffs: a document is
    * kept at a grid point iff `metric >= threshold`. Pass the metric
    * PRE-ROUNDED (e.g. `round(q, 6)`) when it will be compared across
    * engines — a last-ulp difference at an exact grid boundary flips a
    * row. Output: one row per grid point with kept counts and shares.
    */
  def sweep(docs: DataFrame, metric: Column, weight: Column,
            grid: Seq[(Int, Double)]): DataFrame = {
    require(grid.nonEmpty, "empty threshold grid")
    val s = docs.sparkSession
    import s.implicits._
    val g = broadcast(grid.toDF("i", "th"))
    val kept = col("__m") >= col("th")
    docs.select(metric.as("__m"), weight.cast("long").as("__w"))
      .crossJoin(g)
      .groupBy("i", "th")
      .agg(
        sum(when(kept, 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(kept, col("__w")).otherwise(0L)).as("n_tokens_kept"),
        count(lit(1)).as("__nd"),
        sum(col("__w")).as("__nt"))
      .select(col("i"), round(col("th"), 2).as("threshold"),
        col("n_docs_kept"), col("n_tokens_kept"),
        round(col("n_docs_kept").cast("double") / col("__nd"), 6)
          .as("frac_docs"),
        round(col("n_tokens_kept").cast("double") / col("__nt"), 6)
          .as("frac_tokens"))
      .orderBy("i")
  }
}
