package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Versioned snapshot dirs with a `_SUCCESS`-gated reader protocol — the
  * crash-safe replacement for archive-then-overwrite-in-place (reference S6,
  * `archive_existing_datasets`, `json_to_parquet.py:304-367`).
  *
  * Layout: `root/v0, root/v1, ...` — each version a complete dataset write.
  * Writers only ever CREATE a new `v{N}` (never mutate a published one);
  * Spark's commit protocol drops `_SUCCESS` into the dir last, so readers
  * resolving "newest version having `_SUCCESS`" can never observe a torn
  * dataset: a crash mid-write leaves an incomplete dir that readers skip and
  * the next run supersedes. On object stores this also sidesteps
  * rename-is-copy: nothing is ever renamed. Prior versions ARE the archive
  * (poor man's time travel, same metadata shape a table format would keep).
  *
  * Single-writer per root (the reference's per-data-type Glue job shape);
  * concurrent writers could race the same version number.
  */
object Snapshots {

  /** Resolve a dir string to its Hadoop filesystem + path through the
    * session conf — THE way any graft component touches a filesystem
    * (java.io.File would silently mis-handle s3a/hdfs schemes).
    */
  private[graft] def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** All `v{N}` dirs under `root`, ascending; `completeOnly` keeps only
    * versions whose `_SUCCESS` marker exists.
    */
  def versions(spark: SparkSession, root: String,
               completeOnly: Boolean): Seq[(Long, Path)] = {
    val (fs, rootPath) = fsFor(spark, root)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .flatMap(st => st.getPath.getName.stripPrefix("v").toLongOption.map(_ -> st.getPath))
      .filter { case (_, p) => !completeOnly || fs.exists(new Path(p, "_SUCCESS")) }
      .sortBy(_._1)
  }

  /** Newest complete version's path, if any. */
  def latest(spark: SparkSession, root: String): Option[String] =
    versions(spark, root, completeOnly = true).lastOption.map(_._2.toString)

  /** Read the newest complete version; fails loudly when none exists. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no complete snapshot version under $root")))

  /** Write `df` as the next version (max seen + 1 — incomplete crash debris
    * counts, so a failed version number is never reused). `configure`
    * customizes the writer (partitioning, file sizing). Returns the new
    * version path; readers see it only once `_SUCCESS` lands.
    */
  def writeNew(df: DataFrame, root: String)
              (configure: DataFrameWriter[Row] => DataFrameWriter[Row] = identity): String = {
    val spark = df.sparkSession
    val next = versions(spark, root, completeOnly = false)
      .map(_._1).maxOption.getOrElse(-1L) + 1L
    val path = s"$root/v$next"
    configure(df.write.mode("overwrite")).parquet(path)
    path
  }

  /** Marker file tying a snapshot root to the streaming checkpoint that
    * writes it — see [[guardLineage]].
    */
  val LineageMarker = "_graft_checkpoint"

  /** Refuse a FRESH checkpoint pointed at an existing versioned snapshot.
    *
    * Batch 0 with versions already present is ambiguous: a retry of batch 0
    * under the SAME checkpoint (fine — v0 overwrites idempotently) or a new
    * checkpoint over an existing root (data loss: every merge would read
    * "latest below 0" = nothing, while readers keep resolving the stale
    * higher versions). The marker records the owning checkpoint; a mismatch
    * fails loudly. Call at batch 0 from any foreachBatch maintainer that
    * merges from `currentBefore(batchId)` ([[graft.streaming.UpsertStream]],
    * [[graft.streaming.SketchStream]]).
    */
  def guardLineage(spark: SparkSession, snapshotDir: String,
                   checkpointDir: String): Unit = {
    val (filesystem, root) = fsFor(spark, snapshotDir)
    val marker = new Path(root, LineageMarker)
    // compare FULLY-QUALIFIED paths: the same checkpoint spelled relative /
    // absolute / scheme-qualified across restarts must still match, or a
    // legitimate batch-0 retry is refused as a foreign checkpoint
    def qualified(dir: String): String = {
      val (f, p) = fsFor(spark, dir)
      f.makeQualified(p).toString
    }
    val thisCkpt = qualified(checkpointDir)
    val owner: Option[String] =
      if (!filesystem.exists(marker)) None
      else {
        val in = filesystem.open(marker)
        try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim)
        finally in.close()
      }
    owner match {
      case Some(o) if qualified(o) == thisCkpt => () // batch-0 retry, same lineage
      case Some(o) => throw new IllegalStateException(
        s"snapshotDir $snapshotDir is owned by checkpoint $o but this query " +
          s"uses checkpoint $checkpointDir; a fresh checkpoint over an " +
          "existing snapshot would silently merge from an empty base. " +
          "Resume the original checkpoint or start a new snapshotDir.")
      case None if versions(spark, snapshotDir, completeOnly = true).nonEmpty =>
        throw new IllegalStateException(
          s"snapshotDir $snapshotDir already holds snapshot versions but has " +
            "no lineage marker; refusing to rebuild it from batch 0 " +
            "(existing versions would be ignored by merges yet still win in " +
            "current()). Start a new snapshotDir or restore the checkpoint.")
      case None =>
        filesystem.mkdirs(root)
        val out = filesystem.create(marker, true)
        try out.write(checkpointDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
    }
  }

  /** Retention: keep the newest `keep` complete versions; delete every dir
    * (complete or crash debris) older than the oldest kept. Returns deleted
    * paths.
    */
  def prune(spark: SparkSession, root: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val complete = versions(spark, root, completeOnly = true)
    if (complete.size <= keep) return Seq.empty
    val cutoff = complete.takeRight(keep).head._1
    val (fs, _) = fsFor(spark, root)
    versions(spark, root, completeOnly = false)
      .filter(_._1 < cutoff)
      // report only what was ACTUALLY deleted — fs.delete returns false
      // on permission/partial failures and the caller's retention audit
      // must not claim a still-visible version is gone
      .flatMap { case (_, p) =>
        if (fs.delete(p, true)) Some(p.toString) else None }
  }
}
