package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 sparse lexical retrieval (Robertson/Sparck-Jones probabilistic
  * weighting, the Okapi BM25 formulation) — the standard keyword-retrieval
  * primitive of a training-data pipeline: sourcing seed documents,
  * nearest-neighbor text mining for targeted corpora, and the lexical half
  * of hybrid (BM25 + dense) retrieval.
  *
  * Scale shape, ad-hoc path ([[topK]]): the query set is small by contract
  * (requests, not a corpus) so its distinct terms BROADCAST; the corpus's
  * exploded tokens are pruned by that broadcast hash join BEFORE any
  * shuffle — non-matching tokens (the overwhelming majority) never leave
  * their input partition, and only `(term, doc_id)` postings for query
  * terms reach the two small aggregations that follow. Document text never
  * shuffles at all. Per-query ranking uses the `graft_kmin` k-capped heap,
  * so the final exchange carries at most queries x partitions heap rows —
  * the same bounded-shuffle shape as [[Knn.bruteForce]].
  *
  * For a standing corpus, [[buildIndex]] materializes the full postings
  * list once (one shuffle on term); persist it with
  * `postings.write.partitionBy(...)` exactly like [[Ivf.write]] and
  * rescore from the index without touching raw text.
  *
  * Portability: per-term contributions round to 6 decimals, and 6-decimal
  * doubles scale to EXACT integer numerators — the per-doc score is an
  * exact fixed-point long sum, order-independent by construction, so any
  * engine (the DuckDB oracle, q74) reproduces the double bit-for-bit and
  * Spark gets a codegen'd, map-side-partial SUM instead of per-group list
  * state.
  */
object Bm25 {

  /** Full inverted index: `postings` = one row per (term, doc_id) with
    * term frequency `tf` and document length `dl`; `stats` = (n_docs,
    * sum_dl) rows that SUM to the corpus totals (one row per
    * build/append). Document frequency is NOT stored: df is a corpus-wide
    * count, so a stored copy goes stale the moment a batch is appended —
    * instead [[topKIndexed]] counts it over the term-pruned postings
    * (exact: pruning keeps every row of a matching term), which costs one
    * small aggregation over rows the query reads anyway. That makes the
    * index APPEND-ONLY: new docs add posting rows and one stats row,
    * touching nothing that exists.
    */
  final case class Index(postings: DataFrame, stats: DataFrame,
                         buckets: Int = postingsBuckets)

  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Index = {
    graft.GraftFunctions.register(docs.sparkSession)
    val toks = tokenize(docs, idCol, textCol)
    val postings = toks.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    Index(postings, corpusStats(docs, textCol))
  }

  // Cached tokenized-corpus projections for the ad-hoc topK path, keyed by
  // (canonicalized docs plan, id AND text columns — the projection carries
  // the id column, so a key without it would serve the wrong ids to a
  // caller using a different id column on the same corpus). The registry
  // is LRU-bounded at `maxTokenCaches` so a long-lived session over many
  // corpora cannot pin unbounded MEMORY_AND_DISK state; call
  // [[releaseCaches]] per pipeline run to drop everything eagerly.
  private val cachedTokens = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), DataFrame]
  private val maxTokenCaches = 4

  /** Unpersist every tokenized-corpus cache created by [[topK]] so far. */
  def releaseCaches(): Unit = cachedTokens.synchronized {
    cachedTokens.values.foreach(df =>
      try df.unpersist() catch { case _: Throwable => () })
    cachedTokens.clear()
  }

  private[operators] def tokenCacheCount: Int =
    cachedTokens.synchronized(cachedTokens.size)

  private[operators] def cachedTokenStorageLevels
      : Seq[org.apache.spark.storage.StorageLevel] =
    cachedTokens.synchronized(cachedTokens.values.map(_.storageLevel).toSeq)

  /** Top-k BM25 results per query: `(q_id, doc_id, score, rank)`, scores
    * rounded to 6 decimals, ties broken by ascending doc_id. Queries with
    * no matching document produce no rows. Query terms are deduplicated
    * (standard for short keyword queries).
    *
    * The corpus is tokenized ONCE into a spill-capable cached projection
    * (token arrays, not text) feeding both consumers — the corpus stats
    * row and the pruned postings; without the cache Spark re-runs the
    * tokenizer per consumer, which dominated the dense-vocab Scale probe.
    * The cache is corpus-sized (MEMORY_AND_DISK — it spills rather than
    * evicts hot executor memory): the ad-hoc path is for one-shot corpora;
    * a STANDING corpus should pay [[buildIndex]] once instead and query
    * via [[topKIndexed]], which touches no raw text at all.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qIdCol: String, qTextCol: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    graft.GraftFunctions.register(docs.sparkSession)
    val qTerms = localQueryTerms(queries, qIdCol, qTextCol)
    val key = (docs.queryExecution.analyzed.canonicalized, s"$idCol|$textCol")
    val tk = cachedTokens.synchronized {
      val df = cachedTokens.getOrElseUpdate(key, docs
        .select(col(idCol).as("doc_id"), shinglesAllFast(col(textCol), 1).as("__ts"))
        .where(size(col("__ts")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // a harness-side cache release (Bench/Verify clear every pinned
      // block between queries) unpersists the frame but leaves this map
      // entry — a later hit would then silently serve an UNCACHED frame
      // and every consumer would re-run the tokenizer; re-pin it here
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // LRU: move the hit to the tail, then evict from the head past cap
      cachedTokens.remove(key); cachedTokens.put(key, df)
      while (cachedTokens.size > maxTokenCaches) {
        val (k0, v0) = cachedTokens.head
        cachedTokens.remove(k0)
        try v0.unpersist() catch { case _: Throwable => () }
      }
      df
    }
    val stats = tk.agg(count(lit(1)).as("n_docs"),
      sum(size(col("__ts"))).as("sum_dl"))
    val toks = tk.select(col("doc_id"), size(col("__ts")).as("dl"),
      explode(col("__ts")).as("term"))
    // broadcast prune: corpus tokens that match no query term die here,
    // before the postings shuffle
    val ptoks = toks.join(broadcast(qTerms.select("term").distinct()), Seq("term"))
    val postings = ptoks.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // document frequency over the FULL corpus for the pruned terms —
    // postings already carry exactly those terms' rows
    val dft = postings.groupBy("term").agg(count(lit(1)).as("df"))
    score(postings.join(dft, Seq("term")), stats, qTerms, k, k1, b)
  }

  /** Default term → directory bucket count for the persisted postings
    * layout. 256 directories keeps per-bucket file counts sane at corpus
    * scale while a keyword query (tens of terms) still prunes ~90%+ of
    * directories at file listing time. The count a store was WRITTEN with
    * is persisted beside it (`params`) and always wins at read/append
    * time — pruning with a different modulus than the writer's would
    * silently skip directories that hold matching terms.
    */
  val postingsBuckets = 256

  /** Persist an index: postings (term, doc_id, tf, dl) partitioned by a
    * stable hash bucket of the term — a query's file listing then touches
    * only its own terms' directories ([[topKIndexed]] pushes the bucket
    * set as a static partition filter, the same shape as [[Ivf.query]]'s
    * probed-cell pruning) — plus the stats rows and a params row recording
    * the bucket count (the layout contract readers/appenders must follow,
    * persisted like [[MinHashIndex.write]]'s params). Like
    * [[Ivf.write]]/[[MinHashIndex.write]], this is the pay-the-scan-once
    * path: queries against the store never touch raw text again.
    */
  def write(index: Index, path: String, buckets: Int = postingsBuckets): Unit = {
    index.postings
      .withColumn("__bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .withColumn("batch_id", lit(0L))
      .repartition(col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket", "batch_id")
      .parquet(s"$path/postings")
    index.stats.withColumn("batch_id", lit(0L))
      .write.mode("overwrite").partitionBy("batch_id").parquet(s"$path/stats")
    val spark = index.postings.sparkSession
    import spark.implicits._
    Seq(buckets).toDF("postings_buckets")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  /** The bucket count a store was written with; compiled default for
    * stores that predate the params file.
    */
  private def storedBuckets(spark: org.apache.spark.sql.SparkSession,
                            path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/params")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p))
      spark.read.parquet(p.toString).head().getAs[Int]("postings_buckets")
    else postingsBuckets
  }

  /** Add a new batch of documents to a persisted index: posting rows go
    * into their term-hash bucket directories, corpus totals gain one
    * summable stats row. Doc ids are not deduped here (same contract as
    * [[MinHashIndex.append]]).
    *
    * RETRY-IDEMPOTENT as [[Ivf.append]]: postings land under
    * `(__bucket, batch_id)` and the stats row under `batch_id` via dynamic
    * partition overwrite — a replayed append (tokenization is
    * deterministic, so the partition set is identical) replaces its prior
    * attempt instead of double-counting every term. Distinct batches need
    * distinct ids > 0 (0 is the base build).
    */
  def append(docs: DataFrame, idCol: String, textCol: String, path: String,
             batchId: Long): Unit = {
    require(batchId > 0, s"batchId must be > 0 (0 is the base build): $batchId")
    // the STORE's bucket count, not the compiled default — appending with
    // a different modulus would scatter a term across two bucket dirs and
    // break the reader's partition prune
    graft.GraftFunctions.register(docs.sparkSession)
    val buckets = storedBuckets(docs.sparkSession, path)
    val toks = tokenize(docs, idCol, textCol)
    toks.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .withColumn("__bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .withColumn("batch_id", lit(batchId))
      .repartition(col("__bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket", "batch_id").parquet(s"$path/postings")
    corpusStats(docs, textCol).withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$path/stats")
  }

  /** Open a persisted index. Stats rows (one per build/append) collapse to
    * the single corpus-total row here; the postings keep `__bucket` as a
    * partition column so [[topKIndexed]] can prune directories.
    */
  def open(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/stats")
        .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl")),
      storedBuckets(spark, path))

  /** Rewrite a persisted index into a fresh fully-compacted store at
    * `dest`: posting rows collapse back to batch 0 (one co-located
    * shuffle partition per term bucket) and the per-append stats rows
    * fold into a single corpus-total row — the small-files maintenance
    * pass after a season of daily [[append]]s. New directory; the atomic
    * swap is the caller's snapshot/publish step.
    */
  def compactTo(spark: org.apache.spark.sql.SparkSession, path: String,
                dest: String): Unit = {
    val idx = open(spark, path)
    write(idx, dest, idx.buckets)
  }

  /** Rank against a prebuilt [[Index]]. Document frequency is computed
    * over the term-pruned postings (exact — every stored row of a matching
    * term survives the prune), so it is correct even after [[append]]s.
    * On an [[open]]ed index the query-term bucket set is pushed as a
    * static partition filter first: the parquet file listing touches only
    * the query's own term directories.
    */
  /** `allowedDocs`: optional one-column frame of admissible doc ids —
    * filtered lexical retrieval (retrieve-within-language, post-dedup
    * subsets, ACL slices). Document frequencies and corpus stats stay
    * STORE-GLOBAL (the Lucene/Elasticsearch convention: a filter restricts
    * candidates, it does not re-weight IDF), so a doc's score is identical
    * with or without the filter and ranks are dense over the survivors.
    * The semi join runs on the term-pruned postings — filter cost tracks
    * the query's postings slice, not the store.
    */
  def topKIndexed(index: Index, queries: DataFrame, qIdCol: String,
                  qTextCol: String, k: Int, k1: Double = 1.2,
                  b: Double = 0.75,
                  allowedDocs: Option[DataFrame] = None): DataFrame = {
    graft.GraftFunctions.register(index.postings.sparkSession)
    val qTerms = localQueryTerms(queries, qIdCol, qTextCol)
    val qDistinct = qTerms.select("term").distinct()
    val store =
      if (index.postings.columns.contains("__bucket")) {
        // ≤ distinct query terms values — tiny local job on the
        // materialized qTerms relation
        val buckets = qDistinct
          .select(pmod(xxhash64(col("term")), lit(index.buckets.toLong)))
          .distinct().collect().map(_.getLong(0))
        index.postings.where(col("__bucket")
          .isin(buckets.map(java.lang.Long.valueOf): _*))
      } else index.postings
    val pruned = store.join(broadcast(qDistinct), Seq("term"))
    // df via groupBy + broadcast join-back, NOT a window count: the
    // aggregated frame is query-terms-sized so the join back is a
    // broadcast with no exchange of the postings, while a window on term
    // forces a full sort+exchange of the postings slice — measured 2x
    // slower on the indexed-query gates (r14: q86 1.1 -> 2.3 s, reverted)
    val withDf = pruned.join(
      broadcast(pruned.groupBy("term").agg(count(lit(1)).as("df"))), Seq("term"))
    val candidates = allowedDocs.map { a =>
      withDf.join(a.select(col(a.columns.head).as("doc_id")),
        Seq("doc_id"), "left_semi")
    }.getOrElse(withDf)
    score(candidates, index.stats, qTerms, k, k1, b)
  }

  /** `(q_id, term)` rows MATERIALIZED to a local relation: the query table
    * is small by contract (requests, not a corpus), but it feeds two
    * consumers (the distinct-term prune broadcast and the scoring attach)
    * — left lazy, whatever derivation produced the queries would execute
    * once per consumer. One eager job here, the same
    * eager-small-side-at-construction shape as [[BloomPrune.mightJoin]]
    * and [[Ivf.query]]'s probed-cell collect. Guarded so a corpus passed
    * as "queries" by mistake fails loudly instead of flooding the driver.
    */
  private def localQueryTerms(queries: DataFrame, qIdCol: String,
                              qTextCol: String): DataFrame = {
    val qt = queries.select(col(qIdCol).as("q_id"),
      explode(array_distinct(tokens(col(qTextCol)))).as("term"))
    val rows = qt.limit(1000001).collect()
    require(rows.length <= 1000000,
      "BM25 query set exceeds 1M (q_id, term) rows — queries must be a " +
        "request set, not a corpus")
    queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), qt.schema)
  }

  /** One row (n_docs, sum_dl) over non-empty docs — a shuffle-free
    * single-row aggregation on the raw text. Only the one-time
    * build/append paths pay this second tokenization pass (batch-sized on
    * append); [[topK]] shares its cached token projection instead, and
    * [[topKIndexed]] reads the persisted stats rows.
    */
  private def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.select(size(shinglesAllFast(col(textCol), 1)).as("dl"))
      .where(col("dl") > 0)
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

  /** `(term, doc_id, dl)` rows — one per token occurrence, dl > 0. */
  private def tokenize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        shinglesAllFast(col(textCol), 1).as("__ts"))
      .where(size(col("__ts")) > 0)
      .select(col("doc_id"), size(col("__ts")).as("dl"),
        explode(col("__ts")).as("term"))

  private def score(postings: DataFrame, stats: DataFrame, qTerms: DataFrame,
                    k: Int, k1: Double, b: Double): DataFrame = {
    // idf = ln(1 + (N - df + 0.5)/(df + 0.5)): always positive, the
    // standard Lucene-style smoothing. avgdl in pure double arithmetic;
    // expression shapes mirror the q74 oracle SQL token-for-token so both
    // engines execute the identical IEEE operation sequence.
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    val contrib = round(idf * col("tf") * lit(k1 + 1.0) / denom, 6)
    val scored = postings.crossJoin(broadcast(stats))
      .withColumn("__contrib", contrib)
      .join(broadcast(qTerms), Seq("term"))
    // Fixed-point exact summation: each contribution is ALREADY a
    // 6-decimal value, so scaling by 1e6 recovers its integer numerator
    // exactly (the double sits within ulps of the integer — never near a
    // rounding boundary) and the per-doc score is an exact long SUM —
    // order-independent, codegen'd, map-side partial-aggregatable. This
    // replaces a per-group collect_list + sort_array + interpreted fold
    // (memory ∝ group size, no partial aggregation) with O(1) state.
    val perDoc = scored.groupBy("q_id", "doc_id")
      .agg(round(sum(round(col("__contrib") * 1e6, 0).cast("long"))
        .cast("double") / 1e6, 6).as("score"))
    perDoc.groupBy("q_id")
      .agg(call_function("graft_kmin",
        struct((-col("score")).as("o"), col("doc_id"), col("score")),
        lit(k)).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.doc_id").as("doc_id"),
        col("e.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }
}
