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
  * reuse for the replay) maps 1:1 onto the append's batch id, shifted by
  * +1 because streaming ids start at 0 and the base build owns batch 0.
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
      ivfBatch(batch, batchId, indexPath, idCol, vecCol)
    }

  /** As [[runIvf]] for a persisted [[IvfPq]] index (stored centroids AND
    * codebooks encode each batch).
    */
  def runIvfPq(spark: SparkSession, changesDir: String, schema: StructType,
               indexPath: String, checkpointDir: String,
               idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    start(spark, changesDir, schema, checkpointDir) { (batch, batchId) =>
      ivfPqBatch(batch, batchId, indexPath, idCol, vecCol)
    }

  /** Stream new documents from JSON files in `changesDir` into a persisted
    * [[Bm25]] postings index.
    */
  def runBm25(spark: SparkSession, changesDir: String, schema: StructType,
              indexPath: String, checkpointDir: String,
              idCol: String, textCol: String): StreamingQuery =
    start(spark, changesDir, schema, checkpointDir) { (batch, batchId) =>
      bm25Batch(batch, batchId, indexPath, idCol, textCol)
    }

  /** One micro-batch → one idempotent append. Exposed (as
    * [[DedupStream.processBatch]]) so retry semantics — the same streaming
    * `batchId` re-run after an uncommitted crash — are directly testable.
    * Empty batches write no partitions and are free.
    */
  def ivfBatch(batch: DataFrame, batchId: Long, indexPath: String,
               idCol: String, vecCol: String): Unit =
    Ivf.append(batch, indexPath, batchId + 1, idCol, vecCol)

  def ivfPqBatch(batch: DataFrame, batchId: Long, indexPath: String,
                 idCol: String, vecCol: String): Unit =
    IvfPq.append(batch, indexPath, batchId + 1, idCol, vecCol)

  def bm25Batch(batch: DataFrame, batchId: Long, indexPath: String,
                idCol: String, textCol: String): Unit =
    Bm25.append(batch, idCol, textCol, indexPath, batchId + 1)

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
