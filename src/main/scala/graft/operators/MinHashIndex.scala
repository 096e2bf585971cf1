package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band index for INCREMENTAL near-duplicate
  * detection: shingle/hash the standing corpus once, store only its
  * (id, band, bucket) rows, and check each new ingest batch against the
  * index without ever re-reading the old text. This is the missing half of
  * one-shot [[TextDedup.minHashCandidates]] at 100 TB — a daily batch is
  * GBs, the corpus is the 100 TB; recomputing corpus signatures per batch
  * would dwarf the actual work.
  *
  * Scale shape: the index is ~numBands x 16 bytes per document (three to
  * four orders of magnitude smaller than the text). Batch-vs-corpus
  * candidate generation shuffles only (band, bucket, id) triples on the
  * 8-byte bucket hash; the degenerate-bucket cap bounds the worst key
  * exactly like the one-shot path. `write` partitions by band so each of
  * the nBands join tasks reads only its own slice.
  */
object MinHashIndex {

  final case class Index(buckets: DataFrame, shingleN: Int, numHashes: Int,
                         rowsPerBand: Int)

  /** `(id, band, bucket)` LSH band rows for a corpus slice — the rows the
    * index stores. Documents with fewer than `shingleN` tokens have no
    * signature and produce no rows (same contract as the one-shot path).
    */
  def bands(df: DataFrame, idCol: String, textCol: String, shingleN: Int = 3,
            numHashes: Int = 16, rowsPerBand: Int = 4): DataFrame =
    df.select(col(idCol).as("id"),
        minHashFast(col(textCol), shingleN, numHashes).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("id"),
        posexplode(lshBuckets(col("sig"), rowsPerBand)).as(Seq("band", "bucket")))

  /** Build and persist the index: band rows under `path/buckets`
    * (partitioned by band) plus the hash parameters under `path/params`,
    * so [[open]]/[[append]] can never silently mix incompatible hashes.
    */
  def write(df: DataFrame, idCol: String, textCol: String, path: String,
            shingleN: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4): Unit = {
    val s = df.sparkSession
    bands(df, idCol, textCol, shingleN, numHashes, rowsPerBand)
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite").partitionBy("band", "batch_id")
      .parquet(s"$path/buckets")
    import s.implicits._
    Seq((shingleN, numHashes, rowsPerBand))
      .toDF("shingle_n", "num_hashes", "rows_per_band")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  def open(spark: SparkSession, path: String): Index = {
    val p = spark.read.parquet(s"$path/params").head()
    Index(spark.read.parquet(s"$path/buckets"),
      p.getAs[Int]("shingle_n"), p.getAs[Int]("num_hashes"),
      p.getAs[Int]("rows_per_band"))
  }

  /** Add a new batch's band rows to a persisted index (after the batch has
    * been admitted). Parameters come from the stored index, so appended
    * rows are always hash-compatible.
    *
    * RETRY-IDEMPOTENT as [[Ivf.append]]: rows land under `(band, batch_id)`
    * via dynamic partition overwrite — hashing is deterministic, so a
    * replayed append rewrites exactly its own prior partitions. Distinct
    * batches need distinct ids > 0 (0 is the base build). [[DedupStream]]
    * keeps its own outer `batch_id` layout (overwrite-by-stream-batch) —
    * this path is for BATCH orchestration, where the retry unit is the
    * whole append call.
    */
  def append(df: DataFrame, idCol: String, textCol: String, path: String,
             batchId: Long): Unit = {
    require(batchId > 0, s"batchId must be > 0 (0 is the base build): $batchId")
    val idx = open(df.sparkSession, path)
    bands(df, idCol, textCol, idx.shingleN, idx.numHashes, idx.rowsPerBand)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("band", "batch_id").parquet(s"$path/buckets")
  }

  /** Compact a multi-batch index into a single base batch at `dest` —
    * shaped for [[graft.pipeline.IndexVersions.compactLatest]], like
    * [[Ivf.compactTo]]: writes to a NEW directory (in-place rewrites are
    * not atomic on object stores; the swap is the version publish step).
    * Band rows are folded DISTINCT on `(id, band, bucket)`: a well-formed
    * store has one row per (id, band) so this is a no-op, but a document
    * re-ingested under two different batch ids would otherwise carry its
    * duplicate rows forward forever and double-count against the
    * degenerate-bucket cap. Scale: one shuffle of (id, band, bucket)
    * triples — index-sized, never corpus-sized.
    */
  def compactTo(spark: SparkSession, path: String, dest: String): Unit = {
    val idx = open(spark, path)
    idx.buckets.select("id", "band", "bucket").distinct()
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite").partitionBy("band", "batch_id")
      .parquet(s"$dest/buckets")
    import spark.implicits._
    Seq((idx.shingleN, idx.numHashes, idx.rowsPerBand))
      .toDF("shingle_n", "num_hashes", "rows_per_band")
      .write.mode("overwrite").parquet(s"$dest/params")
  }

  // Cached batch-band DataFrames, keyed by (canonicalized batch plan,
  // columns, hash params) — candidates() consumes the batch's band rows
  // from FOUR plan positions (the cap self-join's both sides via `all`,
  // then `n` twice); without a cache the batch text is shingled/hashed
  // once per consumer. Unlike Decontaminate's bench-set registry (whose
  // keys are naturally few), every distinct BATCH is a distinct key, so
  // the registry is LRU-bounded like Bm25.cachedTokens: a direct caller
  // of candidates() that never releases cannot pin unbounded
  // MEMORY_AND_DISK state. [[DedupStream.processBatch]] still releases
  // its own entry eagerly per micro-batch.
  private val cachedBands = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), DataFrame]
  private val maxBandCaches = 4

  /** Unpersist every batch-band cache created by [[candidates]] so far. */
  def releaseCaches(): Unit = cachedBands.synchronized {
    cachedBands.values.foreach(df =>
      try df.unpersist() catch { case _: Throwable => () })
    cachedBands.clear()
  }

  /** Unpersist ONLY the cache entry for this (batch, columns, params) —
    * what a per-micro-batch caller ([[graft.streaming.DedupStream]]) wants:
    * clearing the whole registry would evict entries belonging to OTHER
    * concurrent streams or batch users in the same session.
    */
  def releaseCache(batch: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, numHashes: Int, rowsPerBand: Int): Unit = {
    val key = (batch.queryExecution.analyzed.canonicalized,
      s"$idCol|$textCol|$shingleN|$numHashes|$rowsPerBand")
    cachedBands.synchronized {
      cachedBands.remove(key).foreach(df =>
        try df.unpersist() catch { case _: Throwable => () })
    }
  }

  private[operators] def bandCacheCount: Int =
    cachedBands.synchronized(cachedBands.size)

  /** Near-duplicate candidate pairs for a new batch: `(id_a, id_b, kind)`
    * where kind `new_old` pairs a batch doc (`id_a`) with an indexed doc
    * (`id_b`), and `new_new` pairs two batch docs (`id_a < id_b`).
    * Buckets whose COMBINED (index + batch) size exceeds `maxBucketSize`
    * are dropped — identical semantics to the one-shot path's degeneracy
    * cap. Old-old pairs are never emitted: the standing corpus was already
    * deduped when it was admitted. The batch's band rows are computed in
    * ONE shingle pass and cached (batch-sized by contract) for the four
    * plan positions that read them.
    */
  def candidates(index: Index, batch: DataFrame, idCol: String, textCol: String,
                 maxBucketSize: Int = 1000): DataFrame = {
    val key = (batch.queryExecution.analyzed.canonicalized,
      s"$idCol|$textCol|${index.shingleN}|${index.numHashes}|${index.rowsPerBand}")
    val nb = cachedBands.synchronized {
      val df = cachedBands.getOrElseUpdate(key,
        bands(batch, idCol, textCol, index.shingleN, index.numHashes,
            index.rowsPerBand).withColumn("is_new", lit(true))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // a harness-side cache release between queries unpersists the frame
      // but leaves this map entry — re-pin on hit or the batch is shingled
      // once per plan position again (Bm25.topK's re-pin rationale)
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // LRU: move the hit to the tail, then evict from the head past cap
      cachedBands.remove(key); cachedBands.put(key, df)
      while (cachedBands.size > maxBandCaches) {
        val (k0, v0) = cachedBands.head
        cachedBands.remove(k0)
        try v0.unpersist() catch { case _: Throwable => () }
      }
      df
    }
    val all = nb.unionByName(
      index.buckets.select(col("id"), col("band"), col("bucket"))
        .withColumn("is_new", lit(false)))
    val bounded = Caps.capGroupSize(all, maxBucketSize, "band", "bucket")
    val n = bounded.where(col("is_new"))
      .select(col("band"), col("bucket"), col("id").as("id_a"))
    val o = bounded.where(!col("is_new"))
      .select(col("band"), col("bucket"), col("id").as("id_b"))
    val newOld = n.join(o, Seq("band", "bucket"))
      .select("id_a", "id_b").distinct()
      .withColumn("kind", lit("new_old"))
    val newNew = n.join(n.withColumnRenamed("id_a", "id_b"), Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .withColumn("kind", lit("new_new"))
    newOld.unionByName(newNew)
  }
}
