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
      .map { case (_, p) => fs.delete(p, true); p.toString }
  }
}
