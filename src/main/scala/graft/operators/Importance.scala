package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance weighting for targeted data selection (DSIR — Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw-corpus document by how much its hashed
  * n-gram distribution looks like a small target corpus,
  * `w(doc) = Σ_grams ln(p_target[bucket(gram)] / p_raw[bucket(gram)])`,
  * with add-α smoothed bucket probabilities. High-weight documents are the
  * ones to keep when curating a pretraining mix toward the target domain.
  *
  * Scale shape: both bucket-count aggregations collapse to at most
  * `buckets` rows (one groupBy each), and the log-ratio table is `buckets`
  * rows — always broadcastable. Raw documents then explode to
  * (doc, bucket, count) rows — the one shuffle proportional to corpus
  * size, with map-side partial aggregation and a compact (id, int) key.
  * Document text itself never shuffles.
  *
  * Buckets use the md5-prefix trick (q32/q51's split/sample hashing), so
  * the q76 DuckDB oracle reproduces every bucket assignment; log ratios
  * are rounded to 6 decimals and per-document sums fold in sorted order —
  * IEEE-portable like [[Bm25]]'s scoring.
  */
object Importance {

  /** Per-document importance weight over `raw`: `(idCol, weight)`, one row
    * per raw document with at least one token. Features are word unigrams
    * + bigrams hashed into `buckets` buckets.
    */
  def weights(raw: DataFrame, target: DataFrame, idCol: String,
              textCol: String, buckets: Int = 4096,
              alpha: Double = 1.0): DataFrame = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in (0, 65536] (16-bit md5 prefix), got $buckets")
    val s = raw.sparkSession
    // native shingle expression — the HOF wordShingles formulation is
    // CodegenFallback-interpreted and ~7x slower on the explode (measured)
    def gramsOf(c: Column) = concat(shinglesAllFast(c, 1), shinglesAllFast(c, 2))
    def bucketOf(g: Column) =
      conv(substring(md5(concat(g, lit(":imp"))), 1, 4), 16, 10)
        .cast("long") % buckets
    def bucketCounts(df: DataFrame, n: String) = df
      .select(explode(gramsOf(col(textCol))).as("g"))
      .select(bucketOf(col("g")).as("b"))
      .groupBy("b").agg(count(lit(1)).as(n))
    val tc = bucketCounts(target, "t_n")
    val perDocBucket = raw
      .select(col(idCol).as("doc_id"), explode(gramsOf(col(textCol))).as("g"))
      .select(col("doc_id"), bucketOf(col("g")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n_db"))
    // raw bucket counts roll up from the per-doc table — the raw corpus is
    // tokenized and hashed ONCE, not once for counts and again for scoring
    val rc = perDocBucket.groupBy("b").agg(sum("n_db").as("r_n"))
    val tTot = tc.agg(sum("t_n").as("t_tot"))
    val rTot = rc.agg(sum("r_n").as("r_tot"))
    // smoothed log ratio for EVERY bucket (absent buckets still get the
    // smoothing mass) — `buckets` rows, broadcast to the scoring join
    val lr = s.range(buckets).toDF("b")
      .join(tc, Seq("b"), "left").join(rc, Seq("b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("b"), round(log(
        // totals coalesce to 0 (sum over an empty frame is null): an
        // EMPTY target then reads as the uniform model (alpha mass only)
        // instead of null-poisoning every document's weight
        ((coalesce(col("t_n"), lit(0L)) + lit(alpha)) /
          (coalesce(col("t_tot"), lit(0L)) + lit(alpha * buckets))) /
        ((coalesce(col("r_n"), lit(0L)) + lit(alpha)) /
          (coalesce(col("r_tot"), lit(0L)) + lit(alpha * buckets)))), 6).as("lr"))
    // fixed-point exact sum of the 6-decimal contributions (see
    // Bm25.score): order-independent long addition handles the negative
    // log-ratios exactly too
    perDocBucket.join(broadcast(lr), Seq("b"))
      .withColumn("c", round(col("n_db") * col("lr"), 6))
      .groupBy("doc_id")
      .agg(round(sum(round(col("c") * 1e6, 0).cast("long"))
        .cast("double") / 1e6, 6).as("weight"))
      .withColumnRenamed("doc_id", idCol)
  }
}
