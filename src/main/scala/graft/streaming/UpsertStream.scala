package graft.streaming

import java.nio.charset.StandardCharsets

import graft.operators.Upsert
import org.apache.hadoop.fs.{FileSystem, Path}
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

  /** Ties a snapshotDir to the checkpoint lineage that writes it (see
    * [[guardLineage]]). */
  private val LineageMarker = "_graft_checkpoint"

  def run(spark: SparkSession, changesDir: String, schema: StructType,
          snapshotDir: String, checkpointDir: String,
          keys: Seq[String], orderingCol: String): StreamingQuery = {
    val stream = spark.readStream.schema(schema).json(changesDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 0L) guardLineage(spark, snapshotDir, checkpointDir)
        val hasDeleteCol = batch.columns.contains(DeleteCol)
        val upserts =
          (if (hasDeleteCol) batch.where(!coalesce(col(DeleteCol), lit(false)))
          else batch).drop(DeleteCol)
        val deletes =
          if (hasDeleteCol) Some(batch.where(col(DeleteCol) === true).select(keys.map(col): _*))
          else None
        // merge from the latest version BELOW this batch id: a retried batch
        // whose output completed but whose checkpoint commit didn't must not
        // read the very directory it is about to overwrite
        val existing = currentBefore(spark, snapshotDir, maxExclusive = Some(batchId))
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            upserts.schema))
        val merged = Upsert.latestWins(existing, upserts, keys, orderingCol, deletes)
        // same-version overwrite keeps the batch idempotent under retry
        merged.write.mode("overwrite").parquet(s"$snapshotDir/v$batchId")
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

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) =
    graft.pipeline.Snapshots.fsFor(spark, dir)

  private def completeVersions(spark: SparkSession,
                               snapshotDir: String): Seq[(Long, Path)] =
    graft.pipeline.Snapshots.versions(spark, snapshotDir, completeOnly = true)

  /** Batch 0 with snapshot versions already present is ambiguous: a retry of
    * batch 0 under the SAME checkpoint (fine — v0 is overwritten idempotently)
    * or a FRESH checkpoint pointed at an existing snapshotDir (data loss:
    * every merge would read "latest below 0" = nothing, while `current()`
    * keeps serving the stale versions). A marker file recording the owning
    * checkpoint distinguishes the two; a mismatch fails loudly instead of
    * silently re-deriving the snapshot from scratch. */
  private def guardLineage(spark: SparkSession, snapshotDir: String,
                           checkpointDir: String): Unit = {
    val (filesystem, root) = fs(spark, snapshotDir)
    val marker = new Path(root, LineageMarker)
    // compare FULLY-QUALIFIED paths: the same checkpoint spelled relative /
    // absolute / scheme-qualified across restarts must still match, or a
    // legitimate batch-0 retry is refused as a foreign checkpoint
    def qualified(dir: String): String = {
      val (f, p) = fs(spark, dir)
      f.makeQualified(p).toString
    }
    val thisCkpt = qualified(checkpointDir)
    val owner: Option[String] =
      if (!filesystem.exists(marker)) None
      else {
        val in = filesystem.open(marker)
        try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8).trim)
        finally in.close()
      }
    owner match {
      case Some(o) if qualified(o) == thisCkpt => () // batch-0 retry, same lineage
      case Some(o) => throw new IllegalStateException(
        s"snapshotDir $snapshotDir is owned by checkpoint $o but this query " +
          s"uses checkpoint $checkpointDir; a fresh checkpoint over an " +
          "existing snapshot would silently merge from an empty base. " +
          "Resume the original checkpoint or start a new snapshotDir.")
      case None if completeVersions(spark, snapshotDir).nonEmpty =>
        throw new IllegalStateException(
          s"snapshotDir $snapshotDir already holds snapshot versions but has " +
            "no lineage marker; refusing to rebuild it from batch 0 " +
            "(existing versions would be ignored by merges yet still win in " +
            "current()). Start a new snapshotDir or restore the checkpoint.")
      case None =>
        filesystem.mkdirs(root)
        val out = filesystem.create(marker, true)
        try out.write(checkpointDir.getBytes(StandardCharsets.UTF_8))
        finally out.close()
    }
  }
}
