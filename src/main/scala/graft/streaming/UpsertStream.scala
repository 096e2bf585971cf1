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
    * change row) makes that a no-op. Reader isolation comes from a
    * minimal table-format commit: each bucket's data lives in an
    * immutable generation dir (`__bucket=K/g{v}/`), a batch stages NEW
    * generations without touching the old ones, and the single atomic
    * rename of `_manifest/v{v}` is the read transition — a reader that
    * resolves the manifest mid-batch (or across a crash anywhere before
    * the commit rename) sees the previous COMPLETE snapshot, never a
    * half-swapped one. The one remaining window, disclosed: superseded
    * generations are swept right after the commit, so a reader that
    * resolved manifest v and is still listing files when v+1 commits can
    * hit a deleted generation — the standard table-format GC race, whose
    * production mitigation (retain the last N superseded generations,
    * expire by age) changes only the sweep policy, not this commit
    * protocol. Single writer assumed (the streaming checkpoint already
    * serializes batches).
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
    * materialization, no in-place mutation of live data):
    *
    *  1. RECOVER — restore any pre-manifest `_trash` parking (legacy
    *     crash shape), adopt a pre-manifest flat layout into generation
    *     dirs, then sweep every generation dir the current manifest does
    *     NOT reference (a crashed batch's staged generations, or
    *     superseded generations whose post-commit sweep crashed) plus any
    *     leftover `_staging`. Recovery is pure garbage collection: live
    *     data is never moved.
    *  2. MERGE — read ONLY the touched buckets' live generation dirs
    *     (explicit paths resolved through the manifest — the untouched
    *     snapshot is never listed or opened), merge the delta, and write
    *     the result to `_staging` in one job.
    *  3. STAGE — rename each staged `__bucket=K` under its bucket dir as
    *     a NEW generation `__bucket=K/g{v+1}`. Old generations are not
    *     touched; readers resolving manifest v still see a complete,
    *     consistent snapshot.
    *  4. COMMIT — write the new bucket→generation map to
    *     `_manifest/.tmp-v{v+1}` and rename it to `_manifest/v{v+1}`.
    *     This single rename is the read transition. A bucket whose every
    *     key was tombstoned simply leaves the new manifest, so deleted
    *     rows cannot resurrect.
    *  5. SWEEP — delete the superseded generations of touched buckets
    *     (and the whole dir of emptied buckets), drop `_staging`, prune
    *     old manifest versions.
    *
    * A crash anywhere before step 4's rename leaves the old manifest and
    * every old generation intact — concurrent readers and the replayed
    * batch both see the previous complete snapshot, and the replay
    * re-merges idempotently ([[Upsert.applyChanges]]' ties-to-change-row
    * guard). A crash after step 4 leaves only unreferenced garbage, swept
    * by step 1 of the next batch.
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
    // the spec next to the data; every batch require-matches it. Guarded
    // FIRST so a refused batch mutates nothing (not even recovery).
    guardBucketSpec(fs, snapPath, keys, nBuckets)
    restoreLegacyTrash(fs, snapPath)
    adoptLegacyLayout(fs, snapPath)
    val m = readManifest(fs, snapPath)
    sweepUnreferenced(fs, snapPath, m.live)
    // manifest-routed read of the touched buckets only: explicit generation
    // paths, basePath re-infers the __bucket partition column. At 100 TB
    // this skips even the nBuckets-wide directory listing a partition
    // filter would do — the manifest IS the listing.
    val livePaths = touched.toSeq.flatMap(k => m.live.get(k).map(g =>
      new org.apache.hadoop.fs.Path(snapPath, s"$BucketCol=$k/$g").toString))
    val existing =
      if (livePaths.nonEmpty)
        s.read.option("basePath", snapshotDir).parquet(livePaths: _*)
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
    val staging = new org.apache.hadoop.fs.Path(snapshotDir, "_staging")
    merged.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol)
      .parquet(staging.toString)
    val staged = fs.listStatus(staging)
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$BucketCol=")).toSet
    // every rename is checked: Hadoop FileSystem.rename reports failure by
    // returning FALSE, not throwing — a silently failed stage rename would
    // commit a manifest pointing at a generation that does not exist
    val gen = f"g${m.version + 1}%08d"
    staged.foreach { name =>
      val bdir = new org.apache.hadoop.fs.Path(snapPath, name)
      fs.mkdirs(bdir)
      renameOrThrow(fs, new org.apache.hadoop.fs.Path(staging, name),
        new org.apache.hadoop.fs.Path(bdir, gen))
    }
    // THE commit point: one atomic rename flips every reader to the new
    // generation set. Touched buckets with no staged dir were fully
    // tombstoned and leave the manifest.
    val newLive = m.live -- touched.filterNot(k => staged(s"$BucketCol=$k")) ++
      touched.filter(k => staged(s"$BucketCol=$k")).map(_ -> gen)
    commitManifest(fs, snapPath, m.version + 1, newLive)
    // post-commit sweep: the superseded generations (and emptied buckets'
    // dirs) are garbage now — a crash here just defers them to step 1
    touched.foreach { k =>
      val bdir = new org.apache.hadoop.fs.Path(snapPath, s"$BucketCol=$k")
      newLive.get(k) match {
        case Some(g) => m.live.get(k).filter(_ != g).foreach(old =>
          fs.delete(new org.apache.hadoop.fs.Path(bdir, old), true))
        case None => fs.delete(bdir, true)
      }
    }
    fs.delete(staging, true)
    pruneManifests(fs, snapPath, keep = 3)
    touched
  }

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                            src: org.apache.hadoop.fs.Path,
                            dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Directory of versioned manifest files, under the snapshot dir
    * (underscore-prefixed: invisible to parquet readers). Each committed
    * version is one file `v%08d` holding `bucket<TAB>generation` lines —
    * the complete live-generation map, not a diff, so a reader resolves
    * the snapshot from the single highest version with no log replay.
    */
  val ManifestDir = "_manifest"

  private final case class BucketManifest(version: Long, live: Map[Int, String])

  // %08d is a sort-friendly pad, not a cap: accept any width on read
  private val ManifestVersionRe = "v(\\d{8,})".r

  private def manifestVersions(fs: org.apache.hadoop.fs.FileSystem,
                               dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case ManifestVersionRe(v) => v.toLong
    }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           snapPath: org.apache.hadoop.fs.Path): BucketManifest = {
    val dir = new org.apache.hadoop.fs.Path(snapPath, ManifestDir)
    val versions = manifestVersions(fs, dir)
    if (versions.isEmpty) return BucketManifest(0L, Map.empty)
    val v = versions.max
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, f"v$v%08d"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val live = txt.linesIterator.map(_.trim).filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(k, g) => k.toInt -> g
        case _ => throw new java.io.IOException(
          s"corrupt manifest line under $dir (version $v): '$line'")
      }
    }.toMap
    BucketManifest(v, live)
  }

  /** Write-then-rename: the rename of the complete tmp file to its final
    * `v%08d` name is the snapshot's atomic read transition. */
  private def commitManifest(fs: org.apache.hadoop.fs.FileSystem,
                             snapPath: org.apache.hadoop.fs.Path,
                             version: Long, live: Map[Int, String]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(snapPath, ManifestDir)
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, f".tmp-v$version%08d")
    val out = fs.create(tmp, true)
    out.write(live.toSeq.sortBy(_._1)
      .map { case (k, g) => s"$k\t$g" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    out.close()
    renameOrThrow(fs, tmp, new org.apache.hadoop.fs.Path(dir, f"v$version%08d"))
  }

  /** Retain the latest `keep` manifest versions (history for readers that
    * resolved just before a commit), drop older ones and stale tmps. */
  private def pruneManifests(fs: org.apache.hadoop.fs.FileSystem,
                             snapPath: org.apache.hadoop.fs.Path,
                             keep: Int): Unit = {
    val dir = new org.apache.hadoop.fs.Path(snapPath, ManifestDir)
    val versions = manifestVersions(fs, dir).sorted
    versions.dropRight(keep).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, f"v$v%08d"), false))
    if (fs.exists(dir))
      fs.listStatus(dir).filter(_.getPath.getName.startsWith(".tmp-"))
        .foreach(st => fs.delete(st.getPath, false))
  }

  /** Recovery step: delete every generation dir the manifest does not
    * reference — a crashed batch's staged-but-uncommitted generations, or
    * superseded generations whose post-commit sweep crashed. Pure GC:
    * referenced data is never moved, so readers racing recovery are safe.
    */
  private def sweepUnreferenced(fs: org.apache.hadoop.fs.FileSystem,
                                snapPath: org.apache.hadoop.fs.Path,
                                live: Map[Int, String]): Unit = {
    if (!fs.exists(snapPath)) return
    fs.listStatus(snapPath)
      .filter(_.getPath.getName.startsWith(s"$BucketCol="))
      .foreach { st =>
        val k = st.getPath.getName.stripPrefix(s"$BucketCol=").toInt
        live.get(k) match {
          case None => fs.delete(st.getPath, true)
          case Some(g) => fs.listStatus(st.getPath)
            .filter(_.getPath.getName != g)
            .foreach(c => fs.delete(c.getPath, true))
        }
      }
    fs.delete(new org.apache.hadoop.fs.Path(snapPath, "_staging"), true)
  }

  /** Migration: a snapshot crashed mid-swap under the pre-manifest
    * protocol may have a bucket dir parked in `_trash` with its live dir
    * missing — restore it before adoption so no committed row is lost. */
  private def restoreLegacyTrash(fs: org.apache.hadoop.fs.FileSystem,
                                 snapPath: org.apache.hadoop.fs.Path): Unit = {
    val trash = new org.apache.hadoop.fs.Path(snapPath, "_trash")
    if (!fs.exists(trash)) return
    fs.listStatus(trash).foreach { st =>
      val live = new org.apache.hadoop.fs.Path(snapPath, st.getPath.getName)
      if (!fs.exists(live)) renameOrThrow(fs, st.getPath, live)
    }
    fs.delete(trash, true)
  }

  /** Migration: a pre-manifest snapshot holds parquet files DIRECTLY under
    * each `__bucket=K/`. Wrap each such bucket's files into a `gadopt`
    * generation dir (renames only — no data rewrite) and commit manifest
    * v1 referencing them, after which the manifest protocol owns the
    * snapshot. No-op once any manifest exists.
    *
    * The DISTINCT generation name makes adoption crash-idempotent: with
    * no manifest on disk, a `gadopt` dir can only be crashed-adoption
    * output (re-run finishes wrapping the still-flat buckets and commits
    * over all of them), while `g%08d` dirs can only be a crashed FIRST
    * batch's uncommitted staging (correctly left for the unreferenced
    * sweep). Were both named `g00000001`, a crash mid-adoption would make
    * committed legacy rows indistinguishable from sweepable garbage.
    */
  private def adoptLegacyLayout(fs: org.apache.hadoop.fs.FileSystem,
                                snapPath: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(snapPath) ||
        manifestVersions(fs,
          new org.apache.hadoop.fs.Path(snapPath, ManifestDir)).nonEmpty)
      return
    val gen = "gadopt"
    val bucketDirs = fs.listStatus(snapPath)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$BucketCol="))
    // wrap flat files; a bucket already wrapped by a crashed prior
    // adoption has none left and is skipped
    bucketDirs.foreach { st =>
      if (fs.listStatus(st.getPath).exists(_.isFile)) {
        val gdir = new org.apache.hadoop.fs.Path(st.getPath, gen)
        fs.mkdirs(gdir)
        fs.listStatus(st.getPath).filter(_.isFile).foreach(f =>
          renameOrThrow(fs, f.getPath,
            new org.apache.hadoop.fs.Path(gdir, f.getPath.getName)))
      }
    }
    val live = bucketDirs
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, gen)))
      .map(st => st.getPath.getName.stripPrefix(s"$BucketCol=").toInt -> gen)
      .toMap
    if (live.nonEmpty) commitManifest(fs, snapPath, 1L, live)
  }

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

  /** The bucketed snapshot, if it exists and has live rows. Resolves
    * through the manifest — the atomic read transition [[processBucketedBatch]]
    * commits — so a reader racing a writer (or a crashed batch's leftover
    * staging) sees exactly one complete committed snapshot, never a
    * half-swapped or duplicated one. Pre-manifest snapshots fall back to
    * the flat layout read (their first batch under this protocol adopts
    * them). `dropBucket = false` keeps the physical [[BucketCol]]
    * partition column for callers auditing the on-disk bucket assignment
    * (q164's gate) — still through the manifest, so an unreferenced
    * generation left by a crash between commit and sweep is never read. */
  def currentBucketed(spark: SparkSession, snapshotDir: String,
                      dropBucket: Boolean = true): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    def shed(df: DataFrame): DataFrame =
      if (dropBucket) df.drop(BucketCol) else df
    val m = readManifest(fs, p)
    if (m.version > 0L) {
      if (m.live.isEmpty) None
      else Some(shed(spark.read.option("basePath", snapshotDir)
        .parquet(m.live.toSeq.sortBy(_._1).map { case (k, g) =>
          new org.apache.hadoop.fs.Path(p, s"$BucketCol=$k/$g").toString }: _*)))
    } else if (fs.listStatus(p)
        .exists(_.getPath.getName.startsWith(s"$BucketCol=")))
      Some(shed(spark.read.parquet(snapshotDir)))
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
