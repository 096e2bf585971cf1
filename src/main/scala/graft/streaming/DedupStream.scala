package graft.streaming

import graft.operators.MinHashIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming corpus ingestion with INCREMENTAL near-duplicate rejection —
  * the streaming face of [[MinHashIndex]]: every micro-batch is checked
  * against the band index of everything admitted so far, band collisions
  * are VERIFIED with exact Jaccard (candidates are not verdicts — the
  * one-shot [[graft.operators.TextDedup.minHashNearDup]] contract),
  * verified duplicates are dropped, survivors are published and their
  * band rows join the index. The standing corpus text is re-read only
  * for docs appearing in some candidate pair; per batch the work is
  * O(batch + colliding bucket rows), which is what keeps a 100 TB corpus
  * ingestible at stream latency.
  *
  * Within a batch the keep-first rule applies: a doc is rejected if it has
  * any candidate in the index, or a batch-mate candidate with a smaller
  * id. (Conservative on chains: if a~b and b~c, both b and c are dropped
  * even though b's own match was dropped — duplicate suppression errs
  * toward dropping.)
  *
  * Idempotency on retried batches: both the admitted output and the index
  * band rows are written with DYNAMIC partition overwrite on `batch_id`,
  * so a re-run batch replaces exactly its own partition instead of
  * appending twice. A retried batch (crash after the bands write but
  * before the checkpoint commit) would otherwise see its OWN prior
  * attempt's band rows in the index and drop every doc as a self-match —
  * so the index open excludes rows carrying the current `batch_id`.
  * Readers of the index ([[MinHashIndex.open]]) see `batch_id` as just
  * another column.
  */
object DedupStream {

  /** @param maxFilesPerTrigger cap arriving files per micro-batch —
    *   `Trigger.AvailableNow` honors source rate limits, so `Some(1)`
    *   forces one batch per landed file (the gate shape: the admitted set
    *   must be invariant to where batch boundaries fall only in the sense
    *   the keep-first rule defines, so the gate pins the boundaries);
    *   `None` lets a catch-up run fold the backlog into few batches.
    */
  def run(spark: SparkSession, changesDir: String, schema: StructType,
          indexDir: String, outDir: String, checkpointDir: String,
          idCol: String, textCol: String, shingleN: Int = 3,
          numHashes: Int = 16, rowsPerBand: Int = 4,
          maxBucketSize: Int = 1000, threshold: Double = 0.8,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .json(changesDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // same checkpoint-to-store binding as [[IndexIngest]]: a recreated
        // checkpoint restarts engine ids at 0 and dynamic overwrite would
        // silently replace batch 0's admitted docs and band rows
        val appendId = StreamBinding.resolveAppendId(batch.sparkSession,
          checkpointDir, indexDir, s"$indexDir/buckets", batchId)
        processBatch(batch, appendId, indexDir, outDir, idCol, textCol,
          shingleN, numHashes, rowsPerBand, maxBucketSize, threshold)
        StreamBinding.recordWritten(batch.sparkSession, indexDir, appendId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** One micro-batch of the stream: check against the standing index,
    * drop duplicates, publish survivors, append their band rows. Exposed
    * so retry semantics (same `batchId` re-run) are directly testable
    * without crashing a running query mid-commit.
    */
  def processBatch(batch: DataFrame, batchId: Long, indexDir: String,
                   outDir: String, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 16,
                   rowsPerBand: Int = 4, maxBucketSize: Int = 1000,
                   threshold: Double = 0.8): Unit = {
    val s = batch.sparkSession
    val index = openOrEmpty(s, indexDir, batch, batchId, idCol,
      shingleN, numHashes, rowsPerBand)
    // pair-sized by the bucket cap — materialized so verification, the
    // drop list, and BOTH write actions run the index scan exactly once
    val cands = MinHashIndex.candidates(index, batch, idCol, textCol,
      maxBucketSize).localCheckpoint(true)
    // LSH candidacy is a CANDIDATE, not a verdict: at the default 4x4
    // banding a pair with true Jaccard 0.5 — not a near-duplicate —
    // collides in some band with probability ~23%, and permanently
    // rejecting on raw collision loses unique docs at a rate that grows
    // with the standing corpus. Verify with exact Jaccard like the
    // one-shot path ([[graft.operators.TextDedup.minHashNearDup]]); the
    // old side's text comes from the admitted store pruned to candidate
    // ids, so the batch stays O(batch + colliding rows)
    val docsPath = new org.apache.hadoop.fs.Path(s"$outDir/docs")
    val fsOut = docsPath.getFileSystem(s.sessionState.newHadoopConf())
    val oldDocs =
      if (fsOut.exists(docsPath))
        s.read.parquet(docsPath.toString)
          // retry: the prior attempt's own docs are not prior corpus
          .where(col("batch_id") =!= lit(batchId))
          .select(col(idCol), col(textCol))
      else batch.select(col(idCol), col(textCol)).limit(0)
    val verified = graft.operators.TextDedup.jaccardVerify(cands,
        batch.select(col(idCol), col(textCol)).unionByName(oldDocs),
        idCol, textCol, shingleN, threshold, pruneToCandidates = true)
      .join(cands, Seq("id_a", "id_b")) // recover the pair kind
    val dropIds = verified.where(col("kind") === "new_old").select(col("id_a"))
      .unionByName(verified.where(col("kind") === "new_new").select(col("id_b").as("id_a")))
      .distinct().withColumnRenamed("id_a", idCol)
      .localCheckpoint(true)
    val admitted = batch.join(dropIds, Seq(idCol), "left_anti")
    admitted.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$outDir/docs")
    MinHashIndex.bands(admitted, idCol, textCol, shingleN, numHashes,
        rowsPerBand)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$indexDir/buckets")
    // both writes have materialized everything that read the cached
    // batch bands — release THIS batch's entry so a long-running stream
    // stays bounded (a global clear would evict other streams' caches)
    MinHashIndex.releaseCache(batch, idCol, textCol,
      index.shingleN, index.numHashes, index.rowsPerBand)
    ()
  }

  /** The admitted corpus across all batches. */
  def admitted(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/docs")

  /** Open the standing band index, EXCLUDING rows carried by the current
    * `batchId`: on a retried batch they are the prior attempt's own output,
    * and matching against them would drop every doc as a duplicate of
    * itself before dynamic overwrite replaces the partition.
    */
  private def openOrEmpty(spark: SparkSession, indexDir: String,
                          batch: DataFrame, batchId: Long, idCol: String,
                          shingleN: Int, numHashes: Int,
                          rowsPerBand: Int): MinHashIndex.Index = {
    val path = new org.apache.hadoop.fs.Path(s"$indexDir/buckets")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val buckets =
      if (fs.exists(path))
        spark.read.parquet(path.toString)
          .where(col("batch_id") =!= lit(batchId))
      else batch.select(col(idCol).as("id")).limit(0)
        .withColumn("band", lit(0))
        .withColumn("bucket", lit(0L))
    MinHashIndex.Index(buckets, shingleN, numHashes, rowsPerBand)
  }
}
