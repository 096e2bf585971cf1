package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN detection and removal — the substring-level
  * companion to [[TextDedup]]'s whole-document dedup (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better": boilerplate,
  * licenses, templated passages repeat across documents that are NOT
  * near-duplicates as wholes, and span-level removal is what actually
  * shrinks memorization).
  *
  * The reference formulation builds a corpus-wide suffix array — inherently
  * single-machine. The distributed re-expression: slide a `k`-token window
  * over every document, and call a window DUPLICATED when its exact k-gram
  * occurs in at least `minDocs` DISTINCT documents. The union of duplicated
  * windows approximates the suffix-array "duplicated substring ≥ k tokens"
  * set from below (every duplicated run of ≥ k tokens is covered by
  * duplicated windows; runs shorter than k are invisible — `k` is the
  * minimum match length, exactly the suffix-array tool's threshold).
  *
  * Within-doc repeats are deliberately NOT flagged (`minDocs` counts
  * distinct docs): self-repetition is a quality signal with its own operator
  * (`graft_repetition` / q59), and conflating the two makes both reports
  * ambiguous.
  *
  * Scale shape: the corpus text never shuffles — only `(id, pos, gram-hash)`
  * window rows. Duplicate detection is one hash-partitioned count-distinct
  * per gram hash (map-side partials; no all-pairs anything), the span
  * arithmetic is window functions partitioned BY DOCUMENT (parallel across
  * docs, never a global sort), and the interval list that rides back onto a
  * document row is bounded by that document's own window count.
  *
  * Grams are compared by 64-bit hash, not by string — and on the hashed
  * path no gram string is ever even built: the native `graft_gram_hashes`
  * expression hashes each token once and combines k token hashes per
  * window. At 10^12 corpus windows the expected number of colliding gram
  * PAIRS is ~(10^12)^2 / 2^65 ≈ 3·10^4 — a ~3·10^-8 false-duplicate rate,
  * negligible against the sliver a real corpus's true duplicate rate
  * represents, and the hash halves-or-better the shuffle bytes a 50-byte
  * gram string would cost. (False POSITIVES only — a collision can
  * spuriously mark a window duplicated, never hide a real duplicate.)
  */
object SubstringDedup {

  /** Store/shuffle hash identity of the hashed-gram path — recorded in
    * every persisted gram store's params and required to match on read:
    * a store hashed under one scheme must never silently join a batch
    * hashed under another.
    */
  val HashVersion = "gram64v2"

  /** `(id, __pos, __h)` — every k-token window, 1-based token position.
    * `hashGrams = false` carries the gram STRING as the key instead of its
    * 64-bit hash (collision-free at string-sized shuffle cost — the
    * measurement is in DESIGN; ScaleSubstr is the rig).
    */
  private def windows(df: DataFrame, idCol: String, textCol: String,
                      k: Int, hashGrams: Boolean): DataFrame = {
    // every path flows through here and depends on the native gram
    // expressions — register defensively for sessions not built by Tables
    graft.GraftFunctions.register(df.sparkSession)
    if (hashGrams)
      // native window hashes: no gram STRING is ever materialized — one
      // token-hash pass plus k multiply-adds per window (gram64v2)
      df.select(col(idCol),
          posexplode(gramHashesFast(col(textCol), k)).as(Seq("__p0", "__h")))
        .select(col(idCol), (col("__p0") + 1).as("__pos"), col("__h"))
    else
      df.select(col(idCol),
          posexplode(shinglesAllFast(col(textCol), k)).as(Seq("__p0", "__g")))
        .select(col(idCol), (col("__p0") + 1).as("__pos"), col("__g").as("__h"))
  }

  /** Duplicated windows `(id, __pos)`: window k-grams occurring in at least
    * `minDocs` distinct documents. With `keepFirst` the occurrences inside
    * each gram's lowest-id document are exempt (one canonical copy of the
    * duplicated text survives, everything else is flagged — the
    * keep-one-copy variant of Lee et al.'s remove-all default).
    */
  private[operators] def dupWindows(df: DataFrame, idCol: String, textCol: String,
                                    k: Int, minDocs: Int, keepFirst: Boolean,
                                    hashGrams: Boolean = true): DataFrame = {
    val w = windows(df, idCol, textCol, k, hashGrams)
    val dup = w.groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__nd"), min(col(idCol)).as("__keep"))
      .where(col("__nd") >= minDocs)
      .select(col("__h"), col("__keep"))
    if (keepFirst)
      w.join(dup, Seq("__h")).where(col(idCol) =!= col("__keep"))
        .select(col(idCol), col("__pos"))
    else
      w.join(dup.select("__h"), Seq("__h"), "left_semi")
        .select(col(idCol), col("__pos"))
  }

  /** Per-document duplicated-span report:
    * `(id, n_tokens, n_windows, n_dup_windows, covered_tokens, dup_frac)`
    * — how much of each document is text that also appears elsewhere in the
    * corpus. `covered_tokens` is the exact size of the UNION of the
    * duplicated windows' `[pos, pos+k-1]` intervals; since all intervals
    * share length k and arrive sorted by start, each window contributes
    * `min(k, nextStart - start)` uncovered-by-the-next tokens and the union
    * is one windowed `lead` + sum per document — no interval materialization.
    */
  def report(df: DataFrame, idCol: String, textCol: String, k: Int,
             minDocs: Int = 2, keepFirst: Boolean = false,
             hashGrams: Boolean = true): DataFrame =
    coverageReport(df, idCol, textCol, k,
      dupWindows(df, idCol, textCol, k, minDocs, keepFirst, hashGrams))

  /** The report assembly shared by the batch and incremental paths: fold a
    * `(id, __pos)` duplicated-window set into per-doc coverage and join it
    * onto the narrow per-doc stats.
    */
  private def coverageReport(df: DataFrame, idCol: String, textCol: String,
                             k: Int, dupWins: DataFrame): DataFrame = {
    val perDoc = Window.partitionBy(idCol).orderBy("__pos")
    val cov = dupWins
      .withColumn("__next", lead("__pos", 1).over(perDoc))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(least(lit(k), coalesce(col("__next") - col("__pos"), lit(k))))
          .cast("long").as("covered_tokens"))
    df.select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"),
        greatest(tokenCount(col(textCol)) - lit(k - 1), lit(0))
          .cast("long").as("n_windows"))
      .join(cov, Seq(idCol), "left")
      .withColumn("n_dup_windows", coalesce(col("n_dup_windows"), lit(0L)))
      .withColumn("covered_tokens", coalesce(col("covered_tokens"), lit(0L)))
      .withColumn("dup_frac",
        when(col("n_tokens") > 0,
          round(col("covered_tokens").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)))
  }

  // ------------------------------------------------------------------
  // Persisted gram index: incremental substring dedup. A standing corpus
  // is summarized ONCE into per-gram contribution rows (hash, distinct-doc
  // count, lowest doc id); each daily increment then reports against the
  // store without rescanning corpus text. Same lifecycle contract as the
  // Bm25/Ivf stores: bucket-partitioned layout, batch_id inner partition
  // with dynamic-overwrite retry idempotence, compactTo for small files,
  // params row pinning (k, buckets).
  // ------------------------------------------------------------------

  /** Summable per-gram contribution rows for one build/append:
    * `(__h, n_docs)` — doc sets across batches are assumed DISJOINT (new
    * data), so totals are plain sums. Deliberately no per-gram canonical
    * doc id: `keepFirst` is a batch-path concept; on the incremental path
    * the STORE is canonical (increments never re-flag it), and a dead
    * column at gram-store row counts is real bytes.
    */
  private def contributions(df: DataFrame, idCol: String, textCol: String,
                            k: Int): DataFrame =
    windows(df, idCol, textCol, k, hashGrams = true)
      .groupBy("__h")
      .agg(countDistinct(col(idCol)).cast("long").as("n_docs"))

  /** Build a persisted gram index at `path` from the standing corpus. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String, k: Int,
                 path: String, buckets: Int = 64): Unit = {
    contributions(df, idCol, textCol, k)
      .withColumn("__bucket", pmod(col("__h"), lit(buckets.toLong)))
      .withColumn("batch_id", lit(0L))
      .repartition(col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket", "batch_id")
      .parquet(s"$path/grams")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((k, buckets, HashVersion)).toDF("k", "buckets", "hash")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  private def storedParams(spark: org.apache.spark.sql.SparkSession,
                           path: String): (Int, Int) = {
    val p = spark.read.parquet(s"$path/params")
    val row = p.head()
    // pre-hash-version stores carry no column; anything else must match —
    // joining two hash schemes silently reports every batch clean
    val stored = if (p.columns.contains("hash")) row.getAs[String]("hash")
      else "pre-versioned"
    require(stored == HashVersion,
      s"gram store at $path was hashed with '$stored' but this build uses " +
        s"'$HashVersion' — rebuild the store from the corpus text with the " +
        "current code (compaction cannot migrate hash schemes: it " +
        "re-aggregates stored hashes and the source text is gone)")
    (row.getAs[Int]("k"), row.getAs[Int]("buckets"))
  }

  /** Fold a new batch's gram contributions into the store. Retry-idempotent
    * like [[Bm25.append]]: rows land under `(__bucket, batch_id)` via
    * dynamic partition overwrite and hashing is deterministic, so a
    * replayed append replaces its prior attempt. Batch doc ids must be
    * disjoint from every earlier batch (the summable-contribution
    * contract); distinct batches need distinct ids > 0.
    */
  def appendIndex(df: DataFrame, idCol: String, textCol: String, path: String,
                  batchId: Long): Unit = {
    require(batchId > 0, s"batchId must be > 0 (0 is the base build): $batchId")
    val (k, buckets) = storedParams(df.sparkSession, path)
    contributions(df, idCol, textCol, k)
      .withColumn("__bucket", pmod(col("__h"), lit(buckets.toLong)))
      .withColumn("batch_id", lit(batchId))
      .repartition(col("__bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket", "batch_id").parquet(s"$path/grams")
  }

  /** Rewrite a store into a fresh fully-compacted one at `dest`: per-gram
    * contributions collapse to single batch-0 rows. New directory; the
    * atomic swap is the caller's snapshot/publish step.
    */
  def compactIndexTo(spark: org.apache.spark.sql.SparkSession, path: String,
                     dest: String): Unit = {
    val (k, buckets) = storedParams(spark, path)
    spark.read.parquet(s"$path/grams")
      .groupBy("__h")
      .agg(sum("n_docs").cast("long").as("n_docs"))
      .withColumn("__bucket", pmod(col("__h"), lit(buckets.toLong)))
      .withColumn("batch_id", lit(0L))
      .repartition(col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket", "batch_id")
      .parquet(s"$dest/grams")
    import spark.implicits._
    Seq((k, buckets, HashVersion)).toDF("k", "buckets", "hash")
      .write.mode("overwrite").parquet(s"$dest/params")
  }

  /** [[report]] for a NEW batch against the standing corpus's store: a
    * batch window is duplicated when store distinct docs + batch distinct
    * docs holding its gram reach `minDocs`. With the default `minDocs = 2`
    * that is "gram already in the corpus, or duplicated within the batch"
    * — and for DISJOINT doc-id spaces the result equals
    * `report(corpus ∪ batch)` restricted to the batch's rows
    * (SubstringDedupSpec asserts the equivalence). The standing corpus's
    * own copies are never re-flagged — increments treat the store as
    * canonical, the keepFirst posture.
    *
    * Scale shape: corpus text is never rescanned; the store scan is
    * Bloom-pruned by the BATCH's gram set before aggregating (the
    * [[Decontaminate]] shape — a daily increment's cost tracks the
    * increment and the store slice it actually touches, not the corpus).
    */
  def reportAgainst(spark: org.apache.spark.sql.SparkSession, path: String,
                    batch: DataFrame, idCol: String, textCol: String,
                    minDocs: Int = 2,
                    belowBatchId: Option[Long] = None): DataFrame = {
    val (k, dupWins) =
      dupWindowsAgainst(spark, path, batch, idCol, textCol, minDocs, belowBatchId)
    coverageReport(batch, idCol, textCol, k, dupWins)
  }

  /** [[removeSpans]] for a NEW batch against the standing corpus's store —
    * the daily operation the incremental index exists for: clean today's
    * data of every span the corpus (or the batch itself) already holds,
    * without rescanning corpus text. Same duplicated-window semantics as
    * [[reportAgainst]] (and the same union equivalence, asserted in spec).
    */
  def removeSpansAgainst(spark: org.apache.spark.sql.SparkSession, path: String,
                         batch: DataFrame, idCol: String, textCol: String,
                         minDocs: Int = 2,
                         belowBatchId: Option[Long] = None): DataFrame = {
    val (k, dupWins) =
      dupWindowsAgainst(spark, path, batch, idCol, textCol, minDocs, belowBatchId)
    cutSpans(batch, idCol, textCol, k, dupWins)
  }

  /** The incremental duplicated-window derivation shared by
    * [[reportAgainst]] / [[removeSpansAgainst]]: store distinct-doc counts
    * (Bloom-pruned by the batch's gram set) plus batch distinct-doc counts
    * decide duplication; returns the store's `k` and the `(id, __pos)` set.
    *
    * `belowBatchId` restricts the store scan to `batch_id < belowBatchId`
    * (partition-pruned — `batch_id` is a partition column, so excluded
    * batches are dropped at file-listing time). The streaming clean loop
    * passes its own resolved append id here: a crash-REPLAYED micro-batch
    * whose gram append already landed would otherwise see its own grams as
    * corpus, push every window to `minDocs = 2`, and cut essentially all of
    * its text — then dynamic-overwrite the previously correct output. With
    * the bound, the store a batch cleans against is exactly the store as of
    * the batch's position in the stream, replayed or not.
    */
  private def dupWindowsAgainst(spark: org.apache.spark.sql.SparkSession,
                                path: String, batch: DataFrame, idCol: String,
                                textCol: String, minDocs: Int,
                                belowBatchId: Option[Long] = None): (Int, DataFrame) = {
    val (k, _) = storedParams(spark, path)
    // the window projection feeds three consumers (batch gram counts, the
    // Bloom build underneath them, the coverage semi-join) — materialize
    // the INCREMENT's windows once instead of re-tokenizing its text three
    // times; increment-sized by definition, freed by the ContextCleaner
    val w = windows(batch, idCol, textCol, k, hashGrams = true)
      .localCheckpoint(true)
    val batchCounts = w.groupBy("__h")
      .agg(countDistinct(col(idCol)).cast("long").as("__bnd"))
    val allBatches = spark.read.parquet(s"$path/grams")
    val store = belowBatchId
      .fold(allBatches)(b => allBatches.where(col("batch_id") < lit(b)))
      .select("__h", "n_docs")
    // size the Bloom from the BATCH's own gram count (one cheap agg over
    // the checkpointed windows): the default 2^23-bit geometry saturates
    // for a real daily increment (~10^8 grams -> FP ~ 1.0) and would
    // silently degrade the pruned store scan to a full one. ~10 bits per
    // gram keeps FP ~1 %; the 2^27 cap bounds the broadcast literal at
    // 16 MB (past that the prune still helps, just with a higher FP rate).
    val nGrams = batchCounts.count()
    val numBits = math.min(1L << 27,
      math.max(1L << 20, java.lang.Long.highestOneBit(
        math.max(1L, nGrams * 10) * 2 - 1))).toInt
    val storeCounts = BloomPrune
      .mightJoin(store, batchCounts, "__h", "__h", numBits = numBits)
      .groupBy("__h").agg(sum("n_docs").cast("long").as("__snd"))
    val dup = batchCounts.join(storeCounts, Seq("__h"), "left")
      .where(coalesce(col("__snd"), lit(0L)) + col("__bnd") >= minDocs)
      .select("__h")
    (k, w.join(dup, Seq("__h"), "left_semi").select(col(idCol), col("__pos")))
  }

  /** Rewrite each document with its duplicated spans CUT OUT: tokens covered
    * by any duplicated window are dropped, the survivors re-join with single
    * spaces (the same whitespace normalization [[tokens]] applies). Returns
    * the input columns with `textCol` replaced; documents with no duplicated
    * spans keep their original text verbatim.
    *
    * The merged-interval list per document is bounded by the document's own
    * duplicated-window count and rides back as an array column; the cut is a
    * single codegen'd higher-order-function pass over the token array — the
    * corpus text still never shuffles.
    */
  def removeSpans(df: DataFrame, idCol: String, textCol: String, k: Int,
                  minDocs: Int = 2, keepFirst: Boolean = false): DataFrame =
    cutSpans(df, idCol, textCol, k,
      dupWindows(df, idCol, textCol, k, minDocs, keepFirst))

  /** The span-cut assembly shared by the batch and incremental paths. */
  private def cutSpans(df: DataFrame, idCol: String, textCol: String, k: Int,
                       dupWins: DataFrame): DataFrame = {
    val perDoc = Window.partitionBy(idCol).orderBy("__pos")
    // gaps-and-islands: interval [p, p+k-1] merges with its predecessor when
    // p <= prevEnd + 1 = prevPos + k, so a NEW island starts iff
    // pos - prevPos > k
    val islands = dupWins
      .withColumn("__prev", lag("__pos", 1).over(perDoc))
      .withColumn("__newi",
        when(col("__prev").isNull || col("__pos") - col("__prev") > k, 1)
          .otherwise(0))
      .withColumn("__isl", sum("__newi").over(
        perDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("__pos").as("__s"), (max("__pos") + lit(k - 1)).as("__e"))
      .groupBy(idCol)
      // sorted by __s (struct compare is field-ordered) — the gap-slice
      // rebuild below depends on island order, which collect_list alone
      // does not guarantee
      .agg(array_sort(collect_list(struct(col("__s"), col("__e")))).as("__ivs"))
    val others = df.columns.filterNot(_ == textCol).map(col)
    // survivors = the gaps BETWEEN merged islands, copied out with slice():
    // islands [(s1,e1)..(sm,em)] leave gaps [1,s1-1], [e1+1,s2-1], ...,
    // [em+1,T] — each token is copied at most once, so the rebuild is
    // O(tokens + islands) per document (the per-token exists() scan it
    // replaces was O(tokens x islands): quadratic-ish on a boilerplate-
    // heavy long doc with thousands of islands). Interior gaps are
    // non-empty by the merge invariant (a new island starts only past
    // prevEnd + 1); the boundary gaps collapse to length 0 via greatest.
    df.join(islands, Seq(idCol), "left")
      // rebuild from CASE-PRESERVING tokens: `tokens` lowercases for
      // locale-free gram matching, but reassembly must not destroy the
      // surviving text's case (lowercasing never creates or removes
      // whitespace, so positions align with the match-side tokens)
      .withColumn("__toks",
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0)))
      .withColumn(textCol,
        when(col("__ivs").isNull, col(textCol)).otherwise(concat_ws(" ",
          flatten(zip_with(
            concat(array(lit(1)),
              transform(col("__ivs"), iv => (iv("__e") + 1).cast("int"))),
            concat(transform(col("__ivs"), iv => (iv("__s") - 1).cast("int")),
              array(size(col("__toks")))),
            (gs, ge) => slice(col("__toks"), gs,
              greatest(ge - gs + 1, lit(0))))))))
      .select(others :+ col(textCol): _*)
  }
}
