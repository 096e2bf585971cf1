package graft.streaming

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming CDC maintenance of a keyed parquet snapshot — the incremental
  * end-state of the reference's weekly full-recompute (SURVEY §7.4 risk 5):
  * change files land, each micro-batch merges them into the snapshot with
  * latest-wins semantics, tombstones delete (the reference's `*_Deleted`
  * routing, `json_to_parquet.py:224-301`, applied continuously).
  *
  * Exactly-once story: the checkpoint makes file intake exactly-once;
  * `foreachBatch` output is made effectively idempotent by versioned
  * snapshot directories — batch N writes `v{N}`, re-running a failed batch
  * overwrites the same `v{N}`, and `current()` resolves the highest complete
  * version (marked by Spark's `_SUCCESS`). Readers never see a half-written
  * snapshot: the swap is the directory-version bump, the same archive-then-
  * replace contract as the reference's `archive_existing_datasets`
  * (`json_to_parquet.py:304-367`) but crash-safe.
  *
  * Scale notes: each micro-batch costs O(snapshot + delta) I/O but only
  * delta-sized shuffle (Upsert's anti joins hash-partition on the key; with
  * both sides bucketed the merge is shuffle-free). For 100 TB snapshots the
  * same plan targets a MERGE-capable table format; the operator contract —
  * dedup batch, anti-join existing, subtract tombstones — is unchanged.
  */
object UpsertStream {

  /** Marker column: a change row with `__deleted = true` is a tombstone. */
  val DeleteCol = "__deleted"

  /** @param maxFilesPerTrigger cap change files per micro-batch —
    *   `Trigger.AvailableNow` honors source rate limits, so `Some(1)`
    *   forces one batch per landed file (the gate shape: latest-wins must
    *   hold wherever the batch boundaries fall); `None` lets a catch-up
    *   run fold the whole backlog into few batches.
    */
  def run(spark: SparkSession, changesDir: String, schema: StructType,
          snapshotDir: String, checkpointDir: String,
          keys: Seq[String], orderingCol: String,
          retainVersions: Int = 3,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .json(changesDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 0L) guardLineage(spark, snapshotDir, checkpointDir)
        val hasDeleteCol = batch.columns.contains(DeleteCol)
        // merge from the latest version BELOW this batch id: a retried batch
        // whose output completed but whose checkpoint commit didn't must not
        // read the very directory it is about to overwrite
        val existing = currentBefore(spark, snapshotDir, maxExclusive = Some(batchId))
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            batch.drop(DeleteCol).schema))
        // tombstones participate in latest-wins ordering (Upsert.applyChanges):
        // a delete + later re-insert in ONE micro-batch keeps the key, and a
        // stale/replayed tombstone never deletes a newer existing row — the
        // snapshot no longer depends on where micro-batch boundaries fall
        val merged =
          if (hasDeleteCol)
            Upsert.applyChanges(existing, batch, keys, orderingCol, DeleteCol)
          else Upsert.latestWins(existing, batch, keys, orderingCol, None)
        // same-version overwrite keeps the batch idempotent under retry
        merged.write.mode("overwrite").parquet(s"$snapshotDir/v$batchId")
        // retention: keep >= 2 complete versions so a retried batch still
        // finds its merge base; everything older is superseded storage
        graft.pipeline.Snapshots.prune(spark, snapshotDir,
          math.max(retainVersions, 2))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** The latest complete snapshot version, if any. */
  def current(spark: SparkSession, snapshotDir: String): Option[DataFrame] =
    currentBefore(spark, snapshotDir, maxExclusive = None)

  // versions resolve through the shared Snapshots protocol (Hadoop FS API —
  // java.io.File listing would silently see an empty dir on s3a/hdfs and
  // every merge would start from scratch)
  private def currentBefore(spark: SparkSession, snapshotDir: String,
                            maxExclusive: Option[Long]): Option[DataFrame] = {
    val versions = graft.pipeline.Snapshots.versions(spark, snapshotDir, completeOnly = true)
      .filter { case (v, _) => maxExclusive.forall(v < _) }
    if (versions.isEmpty) None
    else Some(spark.read.parquet(versions.maxBy(_._1)._2.toString))
  }

  /** See [[graft.pipeline.Snapshots.guardLineage]] — shared with every
    * foreachBatch snapshot maintainer. */
  private def guardLineage(spark: SparkSession, snapshotDir: String,
                           checkpointDir: String): Unit =
    graft.pipeline.Snapshots.guardLineage(spark, snapshotDir, checkpointDir)
}
