package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater agreement for labeled / preference data (Fleiss 1971) — the
  * reliability statistic an alignment-data pipeline reports before training
  * on human labels: how much raters agree beyond chance. κ near 0 means the
  * labels are noise and the reward/preference model will fit annotator
  * disagreement, not signal.
  *
  * Only per-item-per-label COUNTS enter the statistic (rater identity never
  * matters), so the whole computation is: one hash aggregation of the
  * ratings to `(item, label, n_ij)`, a fold to per-item agreement, and a
  * label-marginal fold — nothing retains the ratings after the first
  * aggregation, and every frame after it is items- or labels-sized.
  *
  * Exactness discipline (the repo convention): each per-item agreement
  * `P_i = (Σ_j n_ij² − n_i) / (n_i (n_i − 1))` is ONE IEEE division of
  * exact integers (bit-identical cross-engine), micro-quantized to 1e-6
  * before the cross-item mean so the fold is an exact long sum in any
  * association order; the chance-agreement label squares `p_j²` quantize
  * to 1e-12 the same way. κ composes from those via a fixed handful of
  * IEEE ops on identical doubles, so `round(κ, 6)` hash-gates.
  *
  * This is the GENERALIZED form: items may carry different rating counts
  * (`P̄` is the unweighted mean over items, the standard extension);
  * items with fewer than `minRatings` ratings are excluded — `P_i` is
  * undefined at n_i < 2.
  */
object Agreement {

  /** Null-rating exclusion shared by both entry points: a null label is a
    * MISSING rating, not a label — grouped as a category it would let
    * raters "agree on null" and inflate P̄; a null item cannot be scored
    * at all. Both drop before counting (the preferencePairs null-score
    * convention: expected missingness excludes, it never participates).
    */
  private def rated(ratings: DataFrame, itemCol: String, labelCol: String) =
    ratings.where(col(itemCol).isNotNull && col(labelCol).isNotNull)

  /** `(item, n, p_i)` — ratings per item and within-item agreement `P_i`,
    * items with at least `minRatings` ratings (≥ 2 required: `P_i` divides
    * by n(n−1)).
    */
  def fleissPerItem(ratings: DataFrame, itemCol: String, labelCol: String,
                    minRatings: Int = 2): DataFrame = {
    require(minRatings >= 2, s"minRatings >= 2: $minRatings")
    rated(ratings, itemCol, labelCol)
      .groupBy(col(itemCol).as("item"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("nij"))
      .groupBy("item")
      .agg(sum("nij").as("n"), sum(col("nij") * col("nij")).as("ss"))
      .where(col("n") >= minRatings)
      .select(col("item"), col("n"),
        ((col("ss") - col("n")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double")).as("p_i"))
  }

  /** One-row Fleiss' κ summary over the (≥ `minRatings`-rated) items:
    * `(n_items, n_ratings, n_labels, p_bar, p_e, kappa)`, the three
    * statistics rounded to 6 dp. Label marginals are computed over the
    * same item set `P̄` uses.
    */
  def fleiss(ratings: DataFrame, itemCol: String, labelCol: String,
             minRatings: Int = 2): DataFrame = {
    require(minRatings >= 2, s"minRatings >= 2: $minRatings")
    // `counts` feeds three consumers below (per-item P_i, the label
    // marginals, and their total). The ratings fold is NOT repeated at
    // runtime: all three sit on the identical groupBy exchange, which
    // ReuseExchange computes once — an eager checkpoint here was A/B'd
    // and measured as pure overhead (design note 103)
    val counts = rated(ratings, itemCol, labelCol)
      .groupBy(col(itemCol).as("item"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("nij"))
      .withColumn("__n", sum("nij").over(
        org.apache.spark.sql.expressions.Window.partitionBy("item")))
      .where(col("__n") >= minRatings)
    // per-item P_i, micro-quantized before the cross-item fold
    val items = counts.groupBy("item")
      .agg(max("__n").as("n"), sum(col("nij") * col("nij")).as("ss"))
      .select(col("n"),
        round(((col("ss") - col("n")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double")) * 1e6, 0)
          .cast("long").as("pim"))
      .agg(count(lit(1)).as("n_items"), sum("n").as("n_ratings"),
        sum("pim").as("pbarm"))
    // label marginals over the same item set; p_j² quantized to 1e-12
    val labels = counts.groupBy("label")
      .agg(sum("nij").as("tj"))
      .crossJoin(broadcast(
        counts.agg(sum("nij").as("tt"))))
      .select(round(
          (col("tj").cast("double") / col("tt").cast("double")) *
          (col("tj").cast("double") / col("tt").cast("double")) * 1e12, 0)
        .cast("long").as("pj2m"))
      .agg(count(lit(1)).as("n_labels"), sum("pj2m").as("pem"))
    val pBar = col("pbarm").cast("double") / 1e6 / col("n_items")
    val pE = col("pem").cast("double") / 1e12
    items.crossJoin(broadcast(labels))
      .select(col("n_items"), col("n_ratings"), col("n_labels"),
        round(pBar, 6).as("p_bar"), round(pE, 6).as("p_e"),
        // p_e = 1 (every rating one label) leaves κ undefined — null, not
        // an ANSI divide-by-zero
        when(pE === 1.0, lit(null).cast("double"))
          .otherwise(round((pBar - pE) / (lit(1.0) - pE), 6)).as("kappa"))
  }
}
