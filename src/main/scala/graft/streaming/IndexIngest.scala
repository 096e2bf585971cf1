package graft.streaming

import graft.operators.{Bm25, Ivf, IvfPq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming maintenance for the persisted retrieval indexes — the
  * streaming face of `Ivf.append` / `IvfPq.append` / `Bm25.append`, the way
  * [[DedupStream]] is the streaming face of `MinHashIndex`: a standing
  * index is built (and its quantizers/params trained) ONCE in batch, then
  * every arriving micro-batch of new vectors/documents is encoded with the
  * STORED centroids/codebooks/params and appended incrementally. The
  * standing corpus is never re-read; per batch the work is O(batch).
  *
  * Exactly-once without any dedup state: the underlying appends are
  * retry-idempotent (dynamic partition overwrite under an inner `batch_id`
  * partition), so a micro-batch replayed after a crash between the append
  * and the checkpoint commit REPLACES its prior attempt's rows instead of
  * double-appending them. The streaming engine's `batchId` (which restarts
  * reuse for the replay) maps onto append ids through a
  * [[StreamBinding checkpoint-to-store binding]] rather than blindly:
  * overwrite-as-idempotence cuts both ways, and a recreated checkpoint, a
  * second stream on the same store, or a manual `append` inside the
  * stream's id range would otherwise silently replace good batches. The
  * binding pins `base = max batch id at first contact` (the base build
  * owns batch 0), maps streaming batch b to `base + 1 + b`, and refuses
  * loudly on token mismatch or foreign-id collision.
  *
  * Drift contract is inherited from the batch appends: quantizers never
  * retrain on-stream (recall degrades gradually as the distribution moves,
  * correctness never — exact rerank reads true vectors); watch
  * `Ivf.cellStats` and schedule a batch `compactTo`/rebuild when skew
  * says so.
  */
object IndexIngest {

  /** Stream new vectors from JSON files in `changesDir` into a persisted
    * [[Ivf]] index. The index must already exist (a stream cannot train
    * the coarse quantizer).
    */
  def runIvf(spark: SparkSession, changesDir: String, schema: StructType,
             indexPath: String, checkpointDir: String,
             idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    start(spark, changesDir, schema, checkpointDir) { (batch, batchId) =>
      ivfBatch(batch, batchId, indexPath, checkpointDir, idCol, vecCol)
    }

  /** As [[runIvf]] for a persisted [[IvfPq]] index (stored centroids AND
    * codebooks encode each batch).
    */
  def runIvfPq(spark: SparkSession, changesDir: String, schema: StructType,
               indexPath: String, checkpointDir: String,
               idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    start(spark, changesDir, schema, checkpointDir) { (batch, batchId) =>
      ivfPqBatch(batch, batchId, indexPath, checkpointDir, idCol, vecCol)
    }

  /** Stream new documents from JSON files in `changesDir` into a persisted
    * [[Bm25]] postings index.
    */
  def runBm25(spark: SparkSession, changesDir: String, schema: StructType,
              indexPath: String, checkpointDir: String,
              idCol: String, textCol: String): StreamingQuery =
    start(spark, changesDir, schema, checkpointDir) { (batch, batchId) =>
      bm25Batch(batch, batchId, indexPath, checkpointDir, idCol, textCol)
    }

  /** One micro-batch → one idempotent append, routed through the
    * [[StreamBinding]] (resolve id → append → record high-water mark).
    * Exposed (as [[DedupStream.processBatch]]) so retry semantics — the
    * same streaming `batchId` re-run after an uncommitted crash — are
    * directly testable. Empty batches write no partitions and are free.
    */
  def ivfBatch(batch: DataFrame, batchId: Long, indexPath: String,
               checkpointDir: String, idCol: String, vecCol: String): Unit = {
    val spark = batch.sparkSession
    val appendId = StreamBinding.resolveAppendId(spark, checkpointDir,
      indexPath, s"$indexPath/cells", batchId)
    Ivf.append(batch, indexPath, appendId, idCol, vecCol)
    StreamBinding.recordWritten(spark, indexPath, appendId)
  }

  def ivfPqBatch(batch: DataFrame, batchId: Long, indexPath: String,
                 checkpointDir: String, idCol: String, vecCol: String): Unit = {
    val spark = batch.sparkSession
    val appendId = StreamBinding.resolveAppendId(spark, checkpointDir,
      indexPath, s"$indexPath/cells", batchId)
    IvfPq.append(batch, indexPath, appendId, idCol, vecCol)
    StreamBinding.recordWritten(spark, indexPath, appendId)
  }

  def bm25Batch(batch: DataFrame, batchId: Long, indexPath: String,
                checkpointDir: String, idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val appendId = StreamBinding.resolveAppendId(spark, checkpointDir,
      indexPath, s"$indexPath/postings", batchId)
    Bm25.append(batch, idCol, textCol, indexPath, appendId)
    StreamBinding.recordWritten(spark, indexPath, appendId)
  }

  /** Stream new documents into a persisted [[SubstringDedup]] gram index:
    * the standing corpus's duplicated-span summary stays current as data
    * arrives, so tomorrow's [[SubstringDedup.reportAgainst]] sees today's
    * batches. Same binding/idempotence contract as the other stores — the
    * gram contributions land under `(__bucket, batch_id)` with dynamic
    * overwrite, so a replayed batch can never double-count a gram.
    */
  def runGrams(spark: SparkSession, changesDir: String, schema: StructType,
               indexPath: String, checkpointDir: String,
               idCol: String, textCol: String): StreamingQuery =
    start(spark, changesDir, schema, checkpointDir) { (batch, batchId) =>
      gramsBatch(batch, batchId, indexPath, checkpointDir, idCol, textCol)
    }

  def gramsBatch(batch: DataFrame, batchId: Long, indexPath: String,
                 checkpointDir: String, idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val appendId = StreamBinding.resolveAppendId(spark, checkpointDir,
      indexPath, s"$indexPath/grams", batchId)
    graft.operators.SubstringDedup.appendIndex(batch, idCol, textCol,
      indexPath, appendId)
    StreamBinding.recordWritten(spark, indexPath, appendId)
  }

  /** Stream new documents into a persisted [[graft.operators.Winnow]]
    * fingerprint store: the standing corpus's local-overlap index stays
    * current as data arrives, so tomorrow's
    * [[graft.operators.Winnow.overlapAgainst]] sees today's batches.
    * Same binding/idempotence contract as the other stores.
    */
  def runWinnow(spark: SparkSession, changesDir: String, schema: StructType,
                indexPath: String, checkpointDir: String,
                idCol: String, textCol: String): StreamingQuery =
    start(spark, changesDir, schema, checkpointDir) { (batch, batchId) =>
      winnowBatch(batch, batchId, indexPath, checkpointDir, idCol, textCol)
    }

  def winnowBatch(batch: DataFrame, batchId: Long, indexPath: String,
                  checkpointDir: String, idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val appendId = StreamBinding.resolveAppendId(spark, checkpointDir,
      indexPath, s"$indexPath/fps", batchId)
    graft.operators.Winnow.append(batch, idCol, textCol, indexPath, appendId)
    StreamBinding.recordWritten(spark, indexPath, appendId)
  }

  /** The full streaming curation loop over the gram store: each arriving
    * batch is CLEANED against the standing corpus (duplicated spans cut —
    * spans the corpus already holds, or that repeat across the batch's own
    * docs), the cleaned batch lands under `outDir/batch_id=<appendId>`,
    * and THEN the batch's grams fold into the store so later batches
    * dedup against it too. Clean-before-append order matters: a batch
    * must not see its own grams as corpus (its internal duplication is
    * already counted by the report's batch side).
    *
    * Exactly-once end to end: the cleaned output is dynamic-partition-
    * overwritten under the resolved append id and the gram append is
    * retry-idempotent, so a replayed micro-batch replaces BOTH of its
    * prior effects. The cleaned text of a given doc depends on the store
    * state at its batch's position in the stream — deterministic under
    * replay because the clean reads the store bounded to
    * `batch_id < appendId`: a crash between the gram append and the
    * checkpoint commit leaves the batch's own grams in the store, and
    * without the bound the replayed clean would count them as corpus and
    * cut essentially all of the batch's text.
    *
    * The store accumulates the RAW batch's grams, not the cleaned ones —
    * deliberately: the gram index is the memory of every span ever seen,
    * so text that was cut once stays flagged when it reappears in a later
    * batch (appending only cleaned grams would let removed boilerplate
    * re-enter the corpus one copy per batch).
    */
  def runGramsClean(spark: SparkSession, changesDir: String, schema: StructType,
                    indexPath: String, outDir: String, checkpointDir: String,
                    idCol: String, textCol: String): StreamingQuery =
    start(spark, changesDir, schema, checkpointDir) { (batch, batchId) =>
      gramsCleanBatch(batch, batchId, indexPath, outDir, checkpointDir,
        idCol, textCol)
    }

  def gramsCleanBatch(batch: DataFrame, batchId: Long, indexPath: String,
                      outDir: String, checkpointDir: String,
                      idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val appendId = StreamBinding.resolveAppendId(spark, checkpointDir,
      indexPath, s"$indexPath/grams", batchId)
    // clean against the store STRICTLY BELOW this batch's append id: on a
    // crash-replay whose gram append already landed (half-committed batch),
    // an unbounded scan would count the batch's own grams as corpus and cut
    // essentially all of its text; the bound makes the store-as-seen
    // identical on first run and on every replay (partition-pruned filter)
    graft.operators.SubstringDedup
      .removeSpansAgainst(spark, indexPath, batch, idCol, textCol,
        belowBatchId = Some(appendId))
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(appendId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(outDir)
    graft.operators.SubstringDedup.appendIndex(batch, idCol, textCol,
      indexPath, appendId)
    StreamBinding.recordWritten(spark, indexPath, appendId)
  }

  private def start(spark: SparkSession, changesDir: String,
                    schema: StructType, checkpointDir: String)
                   (body: (DataFrame, Long) => Unit): StreamingQuery = {
    val q = spark.readStream.schema(schema).json(changesDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) => body(batch, batchId) }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
