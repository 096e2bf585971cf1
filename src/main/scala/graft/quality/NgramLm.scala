package graft.quality

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the perplexity filter of the CCNet
  * curation recipe (Wenzek et al. 2020: score crawl text with an LM
  * trained on the target corpus; keep the low-perplexity head/middle).
  * Add-k–smoothed bigram probabilities,
  * `p(b|a) = (c(a,b) + k) / (c(a,·) + k·V)`, scored as the per-document
  * MEAN log-probability over its bigrams (perplexity = exp(−mean), so
  * ranking by mean log-prob IS ranking by perplexity, without the exp).
  *
  * Scale shape: the model is two count tables — bigram `(a, b, n_ab)` and
  * context `(a, n_a)` — built with one groupBy each over the TARGET corpus
  * (small by definition in this recipe); scoring the full corpus explodes
  * each doc once to its bigram rows, joins the count tables, and
  * aggregates per doc on a compact key ([[graft.operators.Importance]]'s
  * shape). Count tables usually broadcast; when the target vocabulary is
  * too big for that, the joins degrade gracefully to shuffles on the gram.
  *
  * Portability ([[graft.operators.Bm25]]'s convention): per-bigram log
  * contributions round to 6 decimals and per-doc sums fold as exact longs
  * (order-independent), so DuckDB reproduces every double bit-for-bit.
  */
object NgramLm {

  // Every train() caches one vocab-sized `counted` table that the returned
  // Model's lazy frames keep reading from — so the cache cannot be dropped
  // inside train(), and a session training several LMs would otherwise pin
  // one entry per model forever. Registry + releaseCaches() mirrors
  // [[graft.operators.Decontaminate]]'s convention; a released cache just
  // recomputes if a Model is scored again.
  private val cachedCounts =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Unpersist every `counted` cache created by [[train]] so far. */
  def releaseCaches(): Unit = cachedCounts.synchronized {
    cachedCounts.foreach(df =>
      try df.unpersist() catch { case _: Throwable => () })
    cachedCounts.clear()
  }

  private[quality] def cacheCount: Int =
    cachedCounts.synchronized(cachedCounts.size)

  /** `bigrams`: `(a, b, n_ab)`; `contexts`: `(a, n_a)` where `n_a` counts
    * bigrams whose left token is `a` (NOT raw unigram occurrences — the
    * final token of a doc opens no bigram); `vocab` = distinct training
    * tokens.
    */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
                         vocab: Long, k: Double)

  /** Bigram rows `(doc_id, a, b)` of each document, in order of
    * appearance; docs with fewer than 2 tokens produce none.
    */
  private def bigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1))).as("bg"))
      .select(col("doc_id"), col("bg.0").as("a"), col("bg.1").as("b"))

  /** Count the target corpus ONCE: a single tokenize+explode emits both
    * bigram rows and unigram (vocab) rows, one groupBy counts them, and
    * the counted table — vocab-sized, tiny next to the corpus — is cached.
    * Everything downstream derives from it: `bigrams` filters it,
    * `contexts` re-aggregates the already-counted bigrams (`n_a` = Σ n_ab
    * over the left token — identical to counting bigram rows), and `vocab`
    * counts its unigram groups (which also materializes the cache). The
    * previous formulation scanned the corpus three times: once for vocab
    * at train, then once per count table when the score-side joins pulled
    * on the lazy aggregations.
    */
  def train(target: DataFrame, idCol: String, textCol: String,
            k: Double = 1.0): Model = {
    val gram = target.select(tokens(col(textCol)).as("ts"))
      .select(explode(concat(
        // bigram structs (empty for docs under 2 tokens — greatest() keeps
        // the slice length legal at 0 instead of erroring on negatives)
        transform(
          arrays_zip(
            slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
            slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0)))),
          bg => struct(bg("0").as("a"), bg("1").as("b"),
            lit(null).cast("string").as("t"))),
        // unigram structs from EVERY doc (vocab counts 1-token docs too)
        transform(col("ts"), tk => struct(
          lit(null).cast("string").as("a"), lit(null).cast("string").as("b"),
          tk.as("t"))))).as("r"))
      .select(col("r.a").as("a"), col("r.b").as("b"), col("r.t").as("t"))
    val counted = gram.groupBy("a", "b", "t").agg(count(lit(1)).as("n")).cache()
    cachedCounts.synchronized(cachedCounts += counted)
    val bigrams = counted.where(col("t").isNull)
      .select(col("a"), col("b"), col("n").as("n_ab"))
    val contexts = bigrams.groupBy("a").agg(sum("n_ab").as("n_a"))
    val vocab = counted.where(col("t").isNotNull).count()
    Model(bigrams, contexts, vocab, k)
  }

  /** Mean log-probability per document: `(<id>, n_bigrams, avg_logp)`,
    * 6-decimal; docs with fewer than 2 tokens are absent. Unseen bigrams
    * and unseen contexts fall back to the smoothing mass (never −∞).
    */
  def scoreAvgLogProb(df: DataFrame, idCol: String, textCol: String,
                      model: Model): DataFrame = {
    // no broadcast hint: Spark auto-broadcasts the count tables when they
    // fit under the threshold, and falls back to a shuffle join when a
    // huge training vocabulary makes them too big — a forced broadcast
    // would OOM the driver instead of degrading
    val contrib = bigramRows(df, idCol, textCol)
      .join(model.bigrams, Seq("a", "b"), "left")
      .join(model.contexts, Seq("a"), "left")
      .select(col("doc_id"),
        round(log(
          (coalesce(col("n_ab"), lit(0L)) + lit(model.k)) /
            (coalesce(col("n_a"), lit(0L)) + lit(model.k * model.vocab))), 6)
          .as("c"))
    contrib.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // stable final rounding: S/1e6/n is an exact half-tie whenever n
        // divides 2S but not S (~1/2n of docs), where Spark round and
        // DuckDB round disagree — see functions.Rounding
        graft.functions.Rounding.round6(
          sum(round(col("c") * 1e6, 0).cast("long")).cast("double")
            / 1e6 / count(lit(1))).as("avg_logp"))
      .withColumnRenamed("doc_id", idCol)
  }
}
