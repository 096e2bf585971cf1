package graft.quality

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-stratum corpus "data card" — the summary table a dataset release
  * ships with (cf. "Datasheets for Datasets", Gebru et al., and the data
  * cards attached to public pretraining corpora): volume, length
  * distribution, and exact-duplication rate per language/source stratum.
  *
  * One narrow scan derives tokens/fingerprints; the fingerprint groupBy
  * (the duplicate check) shuffles 16-byte digests, never text; the final
  * per-stratum aggregation is one reduce over compact rows. At 100 TB this
  * is a word-count-shaped job.
  */
object DataCard {

  /** One row per stratum: doc count, token volume, median tokens, p90
    * chars, and how many docs share their (exact, normalized) fingerprint
    * with at least one other document CORPUS-WIDE (duplication crosses
    * strata; the count is attributed to each copy's stratum).
    *
    * Quantiles default to the mergeable KLL sketch (`graft_kll_quantiles`,
    * ≤2.5% rank error at k=200, bounded memory): Spark's exact
    * `percentile` buffers every group value in aggregation state, so a
    * billion-doc stratum at 100 TB blows executor memory. Pass
    * `exactPercentiles = true` only for small strata where the exact
    * order statistic is worth the O(stratum) state.
    */
  def build(docs: DataFrame, strataCol: String, textCol: String,
            charsCol: String, exactPercentiles: Boolean = false): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    // coalesce before fingerprinting: md5(null) is null and the inner
    // join on fp would silently drop every null-text row from ALL the
    // card's stats — null and empty text count as the same (empty)
    // document, which is the honest reading for a stats card
    val d = docs.select(col(strataCol).as("stratum"),
      size(shinglesAllFast(coalesce(col(textCol), lit("")), 1)).as("n_tok"),
      col(charsCol).as("n_chars"),
      md5(coalesce(col(textCol), lit("")).cast("binary")).as("fp"))
    val fc = d.groupBy("fp").agg(count(lit(1)).as("nfp"))
    def quantileOf(c: String, prob: Double): Column =
      if (exactPercentiles) expr(s"percentile($c, $prob)")
      else element_at(call_function("graft_kll_quantiles",
        col(c).cast("double"), array(lit(prob)), lit(200)), 1)
    d.join(fc, Seq("fp"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        round(quantileOf("n_tok", 0.5), 6).as("median_tokens"),
        round(quantileOf("n_chars", 0.9), 6).as("p90_chars"),
        sum(when(col("nfp") > 1, 1L).otherwise(0L)).as("dup_docs"))
  }
}
