package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dataset archiver (reference S6, `archive_existing_datasets`,
  * `/root/reference/src/glue/jobs/json_to_parquet.py:304-367`): before a
  * table is overwritten, move the previous output under
  * `archive/{yyyy_MM_dd}_{runId}/` via filesystem rename.
  *
  * NOTE: rename is O(files) metadata ops on HDFS but a full COPY on object
  * stores, and readers can observe the window between archive and rewrite.
  * [[JsonToParquet.run]] therefore publishes through [[Snapshots]]
  * (versioned dirs, `_SUCCESS`-gated readers — crash-safe, rename-free);
  * this operator remains for explicit move-aside archival on rename-capable
  * filesystems.
  */
object Archiver {

  /** Move `target`'s current contents (if any) to
    * `archiveRoot/{date}_{runId}/`. Returns the archive path when something
    * was archived.
    */
  def archive(spark: SparkSession, target: String, archiveRoot: String,
              runId: String): Option[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val targetPath = new Path(target)
    val fs = targetPath.getFileSystem(conf)
    if (!fs.exists(targetPath)) return None
    val date = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy_MM_dd"))
    val dest = new Path(s"$archiveRoot/${date}_$runId")
    fs.mkdirs(dest.getParent)
    if (!fs.rename(targetPath, dest))
      throw new java.io.IOException(s"failed to archive $target -> $dest")
    Some(dest.toString)
  }

  /** List archived versions, newest first. */
  def versions(spark: SparkSession, archiveRoot: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(archiveRoot)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.toString)
      .sorted(Ordering[String].reverse).toIndexedSeq
  }
}
