package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  * algorithm): hash every k-token gram, slide a w-hash window, and keep
  * each window's minimum hash (rightmost on ties). The guarantee: any
  * shared run of w+k-1 tokens between two documents shares at least one
  * selected fingerprint, at ~2/(w+1) of the gram density — position-robust
  * overlap detection (MinHash is whole-document; substring dedup is exact
  * spans; winnowing is the local-similarity middle ground).
  *
  * The rightmost-tie argmin is made a PLAIN window min by encoding
  * `(hash, position)` into one long: `v = h * 2^20 + (2^20 - pos)` —
  * increasing in h, decreasing in pos at equal h, decodable by div/mod.
  * h keeps the top 40 bits of the native 64-bit gram hash
  * (`graft_gram_hashes` — per-token hashString + FNV fold + mix64; no
  * gram string ever materialized), so v fits int64 with a 2^20 position
  * budget per document. The hash chain is replayed bit-exactly in SQL by
  * [[graft.expressions.OracleHashSql.winnowOverlap]] — selection is
  * deterministic and oracle-checkable, no RNG.
  *
  * Scale shape: grams never leave their document (per-doc windows, the
  * q107 pattern); only the selected `(doc, hash)` fingerprints — a
  * ~2/(w+1) fraction of gram count — shuffle for the overlap join, and
  * degenerate hashes (boilerplate shared by everything) are dropped by a
  * distinct-doc cap exactly like the LSH bucket cap.
  */
object Winnow {

  private val PosBudget = 1L << 20

  /** Selected fingerprints `(id, pos, h)` — `pos` is the 1-based gram
    * position, `h` the 40-bit gram hash. Documents with fewer than
    * `k + w - 1` tokens (no full window) produce no rows.
    *
    * Position budget: grams past position 2²⁰ are dropped (the tie-break
    * encoding reserves 20 bits for the position), so a >1M-token document
    * loses fingerprint coverage for its tail. The bound is OBSERVABLE via
    * [[truncationReport]] — run it alongside any corpus where megatoken
    * documents (books, concatenated code files) are plausible.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, s"k, w >= 1: $k, $w")
    graft.GraftFunctions.register(docs.sparkSession)
    val grams = docs
      .select(col(idCol),
        posexplode(call_function("graft_gram_hashes", col(textCol), lit(k)))
          .as(Seq("__p0", "__h64")))
      .where(col("__p0") < PosBudget - 1)
      .select(col(idCol), (col("__p0") + 1).as("pos"),
        shiftrightunsigned(col("__h64"), 24).as("h"))
    val v = col("h") * PosBudget + (lit(PosBudget) - col("pos"))
    val win = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    grams
      .withColumn("__v", min(v).over(win))
      // only full windows select (the paper's boundary rule: the first
      // window is grams 1..w, represented here by the row at pos = w)
      .where(col("pos") >= w)
      .select(col(idCol), col("__v")).distinct()
      .select(col(idCol),
        (lit(PosBudget) - pmod(col("__v"), lit(PosBudget))).as("pos"),
        shiftright(col("__v"), 20).as("h")) // exact; Column./ is double
  }

  /** Which documents exceed the 2²⁰-gram position budget (and so carry
    * un-fingerprinted tails): `(id, n_grams, truncated)`. Token-count
    * arithmetic only — no gram pass — so it is free to run as the
    * pre-flight audit next to [[fingerprints]]/[[write]]; route flagged
    * documents through [[graft.operators.SubstringDedup]]-style chunking
    * (or split them upstream) before trusting their overlap reports.
    */
  def truncationReport(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 4): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    docs.select(col(idCol).as("id"),
        greatest(size(graft.functions.TextFunctions.tokens(col(textCol)))
          - (k - 1), lit(0)).cast("long").as("n_grams"))
      .withColumn("truncated", col("n_grams") > PosBudget - 1)
  }

  // ------------------------------------------------------------------
  // Persisted fingerprint store — incremental local-overlap against a
  // standing corpus, the [[MinHashIndex]] contract at winnowing
  // granularity: fingerprint the corpus once, keep only (id, h) rows
  // (~2/(w+1) of gram count, no text), and check each ingest batch
  // against the store. Same retry-idempotent (bucket, batch_id) layout,
  // same params pinning, same distinct-folding compaction.
  // ------------------------------------------------------------------

  private val StoreBuckets = 64

  final case class Index(fps: DataFrame, k: Int, w: Int)

  /** Build and persist: fingerprints under `path/fps` (partitioned by a
    * 64-way hash bucket so an overlap join's tasks read aligned slices)
    * plus `(k, w)` under `path/params` so [[open]]/[[append]] can never
    * mix window geometries.
    */
  def write(docs: DataFrame, idCol: String, textCol: String, path: String,
            k: Int = 4, w: Int = 5): Unit = {
    val s = docs.sparkSession
    storeRows(docs, idCol, textCol, k, w)
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite").partitionBy("bucket", "batch_id")
      .parquet(s"$path/fps")
    import s.implicits._
    Seq((k, w)).toDF("k", "w")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  private def storeRows(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, w: Int): DataFrame =
    fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("h")).distinct()
      .withColumn("bucket", pmod(col("h"), lit(StoreBuckets)).cast("int"))

  def open(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val p = spark.read.parquet(s"$path/params").head()
    Index(spark.read.parquet(s"$path/fps"),
      p.getAs[Int]("k"), p.getAs[Int]("w"))
  }

  /** Retry-idempotent append (dynamic overwrite under `(bucket,
    * batch_id)`): fingerprinting is deterministic, so a replayed append
    * rewrites exactly its prior partitions. Params come from the store.
    */
  def append(docs: DataFrame, idCol: String, textCol: String, path: String,
             batchId: Long): Unit = {
    require(batchId > 0, s"batchId must be > 0 (0 is the base build): $batchId")
    val idx = open(docs.sparkSession, path)
    storeRows(docs, idCol, textCol, idx.k, idx.w)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket", "batch_id").parquet(s"$path/fps")
  }

  /** Compact to a single base batch at `dest` (new directory — the swap is
    * the caller's version-publish step), distinct-folding documents
    * re-ingested under different batch ids.
    */
  def compactTo(spark: org.apache.spark.sql.SparkSession, path: String,
                dest: String): Unit = {
    val idx = open(spark, path)
    idx.fps.select("id", "h", "bucket").distinct()
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite").partitionBy("bucket", "batch_id")
      .parquet(s"$dest/fps")
    import spark.implicits._
    Seq((idx.k, idx.w)).toDF("k", "w")
      .write.mode("overwrite").parquet(s"$dest/params")
  }

  /** Batch-vs-store overlap: `(id_a, id_b, kind, n_shared)` where
    * `new_old` pairs a batch doc with an indexed doc and `new_new` pairs
    * two batch docs (`id_a < id_b`). The cap counts distinct docs per
    * hash over index AND batch combined — identical degeneracy semantics
    * to the one-shot [[overlap]]. Batch text is fingerprinted once.
    *
    * A document RE-SUBMITTED under an id the store already holds is
    * compared as NEW and its stored copy is EXCLUDED (anti-join on the
    * batch ids): otherwise its rows appear on both union sides, every
    * one of its hashes double-counts toward the cap, and the report
    * emits an `(id, id)` self-pair that reads as a perfect overlap hit.
    * (Deliberately the opposite of [[MinHashIndex.candidates]], where a
    * self-match means "already present" — exactly what DEDUP should
    * flag; an overlap REPORT should not accuse a doc of matching
    * itself.)
    */
  def overlapAgainst(index: Index, batch: DataFrame, idCol: String,
                     textCol: String, minShared: Long = 2,
                     maxDocsPerHash: Long = 100): DataFrame = {
    val nbRows = fingerprints(batch, idCol, textCol, index.k, index.w)
      .select(col(idCol).as("id"), col("h")).distinct()
    val nb = nbRows.withColumn("is_new", lit(true))
    val all = nb.unionByName(
      // distinct: store rows are (id, h)-unique per batch, but a doc
      // re-ingested under a second batch_id (before compactTo) holds
      // duplicate rows — a raw count would inflate n_shared and the cap.
      // The exclusion set is the SUBMITTED ids, not the fingerprinted
      // ones: a re-submitted doc now shorter than k+w-1 tokens emits no
      // fingerprints, but its stored copy must still leave the store
      // side (and deriving from `batch` spares a second gram-hash pass
      // the divergently-pruned nbRows reference would force)
      index.fps.select(col("id"), col("h")).distinct()
        .join(batch.select(col(idCol).as("id")).distinct(),
          Seq("id"), "left_anti")
        .withColumn("is_new", lit(false)))
    // window-count cap on the shared exchange — see [[overlap]]; each
    // side's rows are distinct (id, h), so at the gate's disjoint
    // batch/index id spaces the row count per h is the distinct-doc count
    val bounded = Caps.capGroupSize(all, maxDocsPerHash, "h")
    val n = bounded.where(col("is_new")).select(col("h"), col("id").as("id_a"))
    val o = bounded.where(!col("is_new")).select(col("h"), col("id").as("id_b"))
    val newOld = n.join(o, Seq("h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .withColumn("kind", lit("new_old"))
    val newNew = n.join(n.select(col("h"), col("id_a").as("id_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .withColumn("kind", lit("new_new"))
    newOld.unionByName(newNew).where(col("n_shared") >= minShared)
      .select("id_a", "id_b", "kind", "n_shared")
  }

  /** Cross-document overlap report: pairs sharing >= `minShared` selected
    * fingerprints. Hashes selected in more than `maxDocsPerHash` documents
    * are dropped before the self-join — the degenerate-boilerplate cap,
    * same reasoning as [[TextDedup.minHashCandidates]]'s bucket cap.
    */
  def overlap(docs: DataFrame, idCol: String, textCol: String,
              k: Int = 4, w: Int = 5, minShared: Long = 2,
              maxDocsPerHash: Long = 100): DataFrame = {
    // The cap is a WINDOW count over h, not a groupBy + semi-join: the
    // window's hash exchange on h is then the single shared subtree both
    // self-join sides reference — ReuseExchange computes the fingerprint
    // pass ONCE and the join on h reuses the partitioning (no caching
    // needed, lineage intact; measured: the groupBy+semi-join shape
    // re-fingerprinted the corpus per plan position). fp rows are
    // distinct (id, h), so the row count per h IS the distinct-doc count.
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("h")).distinct()
    val bounded = Caps.capGroupSize(fp, maxDocsPerHash, "h")
    bounded.select(col("h"), col("id").as("id_a"))
      .join(bounded.select(col("h"), col("id").as("id_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** [[overlapSpans]] against a persisted store — incremental span-level
    * triage: for each batch-vs-store (`new_old`) and batch-vs-batch
    * (`new_new`) pair passing `minShared`, the maximal matched runs in
    * the BATCH document(s). `(id_a, id_b, kind, doc, span_start,
    * span_end, n_fp)` — the store keeps only `(id, h)` rows (no
    * positions, deliberately: they would triple the store for a report
    * the ingest side can always localize), so `new_old` pairs report the
    * new document's spans — exactly the decontamination deliverable
    * ("cut THESE regions of the incoming doc"), while `new_new` pairs
    * report both sides like [[overlapSpans]]. Re-submitted ids follow
    * [[overlapAgainst]]'s exclusion rule; the degeneracy cap counts
    * batch and store documents together, identically.
    */
  def overlapSpansAgainst(index: Index, batch: DataFrame, idCol: String,
                          textCol: String, minShared: Long = 2,
                          maxDocsPerHash: Long = 100,
                          maxGap: Option[Int] = None): DataFrame = {
    val gap = maxGap.getOrElse(index.w)
    require(gap >= 0, s"maxGap >= 0: $gap")
    val nbP = fingerprints(batch, idCol, textCol, index.k, index.w)
      .groupBy(col(idCol).as("id"), col("h"))
      .agg(collect_list(col("pos")).as("ps"))
    val nb = nbP.withColumn("is_new", lit(true))
    // exclusion by SUBMITTED ids, as in [[overlapAgainst]]
    val ob = index.fps.select(col("id"), col("h")).distinct()
      .join(batch.select(col(idCol).as("id")).distinct(),
        Seq("id"), "left_anti")
      .withColumn("ps", array().cast("array<long>"))
      .withColumn("is_new", lit(false))
    val bounded = Caps.capGroupSize(
      nb.unionByName(ob.select("id", "h", "ps", "is_new")),
      maxDocsPerHash, "h")
    val n = bounded.where(col("is_new"))
      .select(col("h"), col("id").as("id_a"), col("ps").as("ps_a"))
    val o = bounded.where(!col("is_new"))
      .select(col("h"), col("id").as("id_b"), col("ps").as("ps_b"))
    // ps_b is empty for store rows, so new_old pairs contribute batch
    // positions only
    val pairHash = n.join(o, Seq("h")).withColumn("kind", lit("new_old"))
      .unionByName(
        n.join(n.select(col("h"), col("id_a").as("id_b"),
          col("ps_a").as("ps_b")), Seq("h"))
          .where(col("id_a") < col("id_b"))
          .withColumn("kind", lit("new_new")))
    spanReport(pairHash, Seq("id_a", "id_b", "kind"), minShared, gap,
      index.k)
  }

  /** Shared tail of the span reports: window-gated `minShared` on the
    * pair frame (`partCols` + `ps_a`/`ps_b` position arrays keyed by
    * `id_a`/`id_b`), single-pass both-side explode, lag/running-sum
    * island merge at radius `gap + k`, span aggregation. See
    * [[overlapSpans]] for why the gate is a window count and the merge
    * radius is theorem-backed.
    */
  private def spanReport(pairHash: DataFrame, partCols: Seq[String],
                         minShared: Long, gap: Int, k: Int): DataFrame = {
    val gated = pairHash.withColumn("__ns",
        count(lit(1)).over(Window.partitionBy(partCols.map(col): _*)))
      .where(col("__ns") >= minShared)
    val matched = gated.select(partCols.map(col) :+
        explode(concat(
          transform(col("ps_a"),
            p => struct(col("id_a").as("doc"), p.as("pos"))),
          transform(col("ps_b"),
            p => struct(col("id_b").as("doc"), p.as("pos"))))).as("e"): _*)
      .select(partCols.map(col) :+ col("e.doc").as("doc") :+
        col("e.pos").as("pos"): _*)
      .distinct()
    val win = Window.partitionBy((partCols :+ "doc").map(col): _*)
      .orderBy("pos")
    matched
      .withColumn("__new",
        when(coalesce(col("pos") - lag("pos", 1).over(win),
          lit(Long.MaxValue)) > gap + k, 1).otherwise(0))
      .withColumn("__run", sum("__new").over(
        win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((partCols ++ Seq("doc", "__run")).map(col): _*)
      .agg(min("pos").as("span_start"),
        (max("pos") + (k - 1)).as("span_end"),
        count(lit(1)).as("n_fp"))
      .select((partCols ++ Seq("doc", "span_start", "span_end",
        "n_fp")).map(col): _*)
  }

  /** Span-level overlap report — MOSS's actual deliverable, "WHERE do
    * these two documents overlap", not just "that they do": for every
    * pair passing `minShared`, the maximal matched token runs in EACH
    * document. `(id_a, id_b, doc, span_start, span_end, n_fp)` — `doc`
    * is one of the pair's ids, the span bounds are 1-based token
    * positions (a fingerprint at gram position p covers tokens
    * p .. p+k-1), `n_fp` the matched fingerprints merged into the run.
    *
    * Merge rule: consecutive matched positions join one run when they
    * are at most `maxGap + k` apart (gap between covered intervals
    * ≤ `maxGap`). The default `maxGap = w` is the theorem-backed choice:
    * inside a truly shared region every w-gram window's minimum is
    * selected in BOTH documents, so consecutive matched positions there
    * are ≤ w apart and a genuine shared run can never split.
    *
    * Scale shape: everything after [[fingerprints]] is fingerprint- and
    * pair-sized, and the gram-hash pass runs ONCE: positions ride the
    * capped exchange as per-(doc, hash) arrays (a groupBy in place of
    * [[overlap]]'s distinct — same exchange, rows stay (id, h)-unique so
    * the window count per h is still the distinct-doc count), so both
    * self-join sides and the position explode reuse the one subtree
    * instead of re-fingerprinting the corpus per plan position (the
    * note-57 lesson). Array sizes are within-doc — bounded by the gram
    * budget, and in practice by q59-style repetition filtering upstream.
    */
  def overlapSpans(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 5, minShared: Long = 2,
                   maxDocsPerHash: Long = 100,
                   maxGap: Option[Int] = None): DataFrame = {
    val gap = maxGap.getOrElse(w)
    require(gap >= 0, s"maxGap >= 0: $gap")
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .groupBy(col(idCol).as("id"), col("h"))
      .agg(collect_list(col("pos")).as("ps"))
    val bounded = Caps.capGroupSize(fp, maxDocsPerHash, "h")
    val pairHash = bounded
      .select(col("h"), col("id").as("id_a"), col("ps").as("ps_a"))
      .join(bounded.select(col("h"), col("id").as("id_b"),
        col("ps").as("ps_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
    // the minShared gate inside [[spanReport]] is a window count riding
    // the pair exchange (the note-57 shape one level up): a semi-join
    // against a separately aggregated pair frame re-plans the whole
    // fingerprint subtree under DIVERGENT column pruning (the count
    // branch drops the position arrays), which defeats exchange reuse —
    // measured 8 gram passes vs this plan's 1+reuse. Matched positions
    // are distinct'd per (pair, side) — one position can match through
    // several hashes and one hash at several positions.
    spanReport(pairHash, Seq("id_a", "id_b"), minShared, gap, k)
  }
}
