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

  /** Hive partition column of the bucketed snapshot layout. */
  val BucketCol = "__bucket"

  /** Bucketed-snapshot CDC maintenance — the O(delta) path [[run]]'s
    * scaladoc promises: the snapshot lives as `__bucket=K/` hive
    * partitions (K = hash of the key mod `nBuckets`), and each micro-batch
    * rewrites ONLY the buckets its delta touches via dynamic partition
    * overwrite. Per batch the I/O is O(delta + touched-bucket bytes) and
    * the shuffle is delta-scale — batch cost scales with the DELTA, not
    * the snapshot (ScaleBucketedUpsert pins this), which is the
    * MERGE-table shape a 100 TB snapshot needs.
    *
    * Trades vs [[run]], stated: retry idempotency comes from the MERGE
    * SEMANTICS instead of versioned directories — a replayed batch
    * re-merges its own changes onto already-merged buckets, and
    * [[Upsert.applyChanges]]' symmetric staleness guard (ties go to the
    * change row) makes that a no-op. Reader isolation is weaker: a reader
    * racing the write can see a touched bucket mid-overwrite ([[run]]'s
    * versioned dirs never expose that window); at 100 TB the same layout
    * targets a MERGE-capable table format whose commit protocol restores
    * snapshot isolation without changing this operator contract.
    */
  def runBucketed(spark: SparkSession, changesDir: String, schema: StructType,
                  snapshotDir: String, checkpointDir: String,
                  keys: Seq[String], orderingCol: String, nBuckets: Int = 64,
                  maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .json(changesDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 0L) guardLineage(spark, snapshotDir, checkpointDir)
        val touched = processBucketedBatch(batch, snapshotDir, keys,
          orderingCol, nBuckets)
        writeAudit(spark, snapshotDir, batchId, touched)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Per-batch merge audit: one tiny JSON file per micro-batch under
    * `_audit/` (underscore-prefixed, invisible to parquet readers of the
    * snapshot) recording which buckets the batch touched. This is the
    * observable half of the O(delta) contract — at 100 TB it's the line a
    * pipeline dashboard plots (buckets rewritten per batch vs buckets
    * total), and it's what q164's oracle checks the partition pruning
    * against. Same-name overwrite keeps a replayed batch idempotent.
    */
  private def writeAudit(spark: SparkSession, snapshotDir: String,
                         batchId: Long, touched: Array[Int]): Unit = {
    val p = new org.apache.hadoop.fs.Path(snapshotDir,
      s"_audit/batch-$batchId.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    out.write((s"""{"batch_id":$batchId,"n_touched":${touched.length},""" +
      s""""touched":[${touched.mkString(",")}]}""" + "\n").getBytes("UTF-8"))
    out.close()
  }

  /** One micro-batch of the bucketed merge; returns the (sorted) bucket ids
    * the delta touched — exactly the partitions read and rewritten, the
    * measurable face of the O(delta) contract. Exposed so retry semantics
    * (same batch re-applied after a crash) are directly testable.
    *
    * Commit protocol (one merge computation, no snapshot-sized
    * materialization): the merged touched buckets land in an
    * underscore-prefixed staging dir (invisible to parquet readers of the
    * snapshot), then each touched bucket swaps via rename — live parks in
    * `_trash`, staged becomes live, trash drops last. A bucket whose every
    * key was tombstoned simply has no staged dir and its live dir is
    * removed, so deleted rows cannot resurrect. A crash mid-swap is
    * recovered on the next batch: parked trash dirs whose live is missing
    * rename back, and the replayed batch re-merges idempotently
    * ([[Upsert.applyChanges]]' ties-to-change-row guard). Readers racing a
    * swap can see a touched bucket disappear for the rename window — the
    * isolation trade [[runBucketed]]'s scaladoc states.
    */
  def processBucketedBatch(batch: DataFrame, snapshotDir: String,
                           keys: Seq[String], orderingCol: String,
                           nBuckets: Int): Array[Int] = {
    require(nBuckets > 0, s"nBuckets > 0: $nBuckets")
    require(!batch.columns.contains(BucketCol),
      s"change batch already carries $BucketCol")
    val s = batch.sparkSession
    if (batch.isEmpty) return Array.empty
    val hasDeleteCol = batch.columns.contains(DeleteCol)
    val delta = batch.withColumn(BucketCol,
      pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)).cast("int"))
    // bounded collect: at most nBuckets ints — which buckets this delta
    // touches, i.e. which snapshot partitions participate in the merge
    val touched = delta.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    val snapPath = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = snapPath.getFileSystem(s.sessionState.newHadoopConf())
    // the bucket spec is part of the snapshot's identity: a later run with
    // a different nBuckets (or key order) would hash delta keys into
    // buckets the standing rows don't live in — old rows never merge or
    // tombstone and duplicate keys silently accumulate. First batch writes
    // the spec next to the data; every batch require-matches it.
    guardBucketSpec(fs, snapPath, keys, nBuckets)
    val staging = new org.apache.hadoop.fs.Path(snapshotDir, "_staging")
    val trash = new org.apache.hadoop.fs.Path(snapshotDir, "_trash")
    // recover a crashed swap: a bucket parked in _trash whose live dir is
    // missing was mid-rename — restore it, then re-merge (idempotent)
    if (fs.exists(trash)) {
      fs.listStatus(trash).foreach { st =>
        val live = new org.apache.hadoop.fs.Path(snapPath, st.getPath.getName)
        if (!fs.exists(live)) renameOrThrow(fs, st.getPath, live)
      }
      fs.delete(trash, true)
    }
    // "snapshot exists" = at least one bucket partition — the dir itself
    // may pre-exist holding only the lineage marker guardLineage wrote
    val hasData = fs.exists(snapPath) &&
      fs.listStatus(snapPath).exists(_.getPath.getName.startsWith(s"$BucketCol="))
    val existing =
      if (hasData)
        // partition filter: only the touched __bucket=K dirs are listed
        // and read — the untouched snapshot is never opened
        s.read.parquet(snapshotDir)
          .where(col(BucketCol).isin(touched.map(Integer.valueOf): _*))
      else delta.drop(DeleteCol).limit(0)
    val merged =
      if (hasDeleteCol)
        Upsert.applyChanges(existing, delta, keys, orderingCol, DeleteCol)
      else Upsert.latestWins(existing, delta, keys, orderingCol, None)
    // ONE job computes the merge and writes the touched buckets to staging.
    // The repartition keys each bucket into one task so the partitioned
    // write emits one file per bucket — without it every reduce task fans
    // out a file into every touched bucket dir (tasks x buckets small
    // files, the classic partitionBy mistake)
    merged.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol)
      .parquet(staging.toString)
    val staged = fs.listStatus(staging)
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$BucketCol=")).toSet
    fs.mkdirs(trash)
    // every rename is checked: Hadoop FileSystem.rename reports failure by
    // returning FALSE, not throwing — an unchecked staged->live rename after
    // a successful live->trash park would let the trash sweep below destroy
    // the only remaining copy of the bucket
    touched.foreach { k =>
      val name = s"$BucketCol=$k"
      val live = new org.apache.hadoop.fs.Path(snapPath, name)
      if (fs.exists(live))
        renameOrThrow(fs, live, new org.apache.hadoop.fs.Path(trash, name))
      if (staged(name))
        renameOrThrow(fs, new org.apache.hadoop.fs.Path(staging, name), live)
    }
    // sweep the parked copies only after verifying the swap actually
    // completed: every touched bucket either has a live dir again or was
    // intentionally emptied (no staged dir — all its keys tombstoned). A
    // failed verification leaves _trash in place for the recovery path
    // above and aborts the batch, so the checkpoint never commits it.
    touched.foreach { k =>
      val name = s"$BucketCol=$k"
      if (staged(name) &&
          !fs.exists(new org.apache.hadoop.fs.Path(snapPath, name)))
        throw new java.io.IOException(
          s"bucket swap incomplete: $name staged but not live under " +
            s"$snapshotDir — parked copy retained in _trash")
    }
    fs.delete(trash, true)
    fs.delete(staging, true)
    touched
  }

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                            src: org.apache.hadoop.fs.Path,
                            dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** The spec marker's file name, under the snapshot dir (underscore-
    * prefixed: invisible to parquet readers, same convention as the
    * lineage marker). */
  val BucketSpecFile = "_bucketspec"

  private def guardBucketSpec(fs: org.apache.hadoop.fs.FileSystem,
                              snapPath: org.apache.hadoop.fs.Path,
                              keys: Seq[String], nBuckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(snapPath, BucketSpecFile)
    val spec = s"nBuckets=$nBuckets;keys=${keys.mkString(",")}"
    if (fs.exists(p)) {
      val in = fs.open(p)
      val found = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      require(found == spec,
        s"bucket spec mismatch under $snapPath: snapshot was written with " +
          s"'$found' but this batch runs with '$spec' — delta keys would " +
          "hash into buckets the standing rows don't live in")
    } else {
      fs.mkdirs(snapPath)
      val out = fs.create(p, true)
      out.write((spec + "\n").getBytes("UTF-8"))
      out.close()
    }
  }

  /** The bucketed snapshot, if it exists (all buckets, one live version). */
  def currentBucketed(spark: SparkSession, snapshotDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p)
        .exists(_.getPath.getName.startsWith(s"$BucketCol=")))
      Some(spark.read.parquet(snapshotDir).drop(BucketCol))
    else None
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
