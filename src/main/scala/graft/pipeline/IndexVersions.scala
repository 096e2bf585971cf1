package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned publishing for the persisted retrieval indexes (IVF / IVF-PQ /
  * BM25 / MinHash bands) — the atomic-swap step the index `compactTo`s
  * defer to ([[Snapshots]]' protocol, adapted to multi-directory stores).
  *
  * An index store is a DIRECTORY TREE (`cells/` + `centroids/` +
  * `codebooks/` + `stats/`...), not a single parquet dataset, so
  * [[Snapshots.writeNew]]'s "Spark drops `_SUCCESS` last" guarantee does
  * not cover it: each sub-dataset gets its own `_SUCCESS`, and a reader
  * could open a version whose `cells/` committed but whose `stats/` did
  * not. This publisher seals a version EXPLICITLY: build into `root/v{N}`,
  * and only after the build function returns is the `_GRAFT_PUBLISHED`
  * marker created (one atomic PUT on an object store). Readers resolve
  * "newest SEALED version" and can never observe a torn index; a crash
  * mid-build leaves an unsealed dir that readers skip and whose version
  * number is never reused (crash debris counts toward max, as
  * [[Snapshots]]). Prior versions are the rollback path.
  *
  * Intended rhythm: daily idempotent `append`s land on the CURRENT sealed
  * version's store (safe — appends are retry-idempotent and additive);
  * when `Ivf.cellStats` skew or small-file accumulation says so, seal a
  * compacted successor via [[compactLatest]] and let readers roll forward.
  *
  * Single-writer per root ([[Snapshots]]' contract): two CONCURRENT
  * publishers can resolve the same next version number and interleave
  * builds into one directory before either seals it — serialize publishes
  * through the orchestrator (the reference's workflow concurrency is 1).
  * Retries of a crashed publish are safe: the debris version is unsealed
  * and its number is burned.
  */
object IndexVersions {

  val Marker = "_GRAFT_PUBLISHED"

  /** All `v{N}` dirs under `root`, ascending; `sealedOnly` keeps versions
    * whose [[Marker]] exists.
    */
  def versions(spark: SparkSession, root: String,
               sealedOnly: Boolean): Seq[(Long, Path)] = {
    val (fs, rootPath) = Snapshots.fsFor(spark, root)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .flatMap(st => st.getPath.getName.stripPrefix("v").toLongOption
        .map(_ -> st.getPath))
      .filter { case (_, p) => !sealedOnly || fs.exists(new Path(p, Marker)) }
      .sortBy(_._1)
  }

  /** Newest sealed version's store path, if any — rendered under the
    * caller's `root` string (not the filesystem-qualified URI), so it
    * round-trips into the index `open`s exactly like a path the caller
    * built by hand.
    */
  def latest(spark: SparkSession, root: String): Option[String] =
    versions(spark, root, sealedOnly = true).lastOption
      .map { case (n, _) => s"$root/v$n" }

  /** Build the next version: `build` receives the fresh `root/v{N}` path
    * and writes the complete index store into it (e.g.
    * `p => Ivf.write(index, p)`); the version is sealed only after `build`
    * returns. Returns the sealed path. A `build` that throws leaves an
    * unsealed dir — readers never see it.
    */
  def publish(spark: SparkSession, root: String)(build: String => Unit): String = {
    val next = versions(spark, root, sealedOnly = false)
      .map(_._1).maxOption.getOrElse(-1L) + 1L
    val path = s"$root/v$next"
    build(path)
    val (fs, _) = Snapshots.fsFor(spark, root)
    fs.create(new Path(path, Marker), false).close()
    path
  }

  /** Seal a compacted successor of the newest sealed version: `compact` is
    * the index type's `compactTo(src, dest)` (e.g.
    * `Ivf.compactTo(spark, _, _)`). Readers keep resolving the old version
    * until the new marker lands, then roll forward atomically.
    */
  def compactLatest(spark: SparkSession, root: String)
                   (compact: (String, String) => Unit): String = {
    val src = latest(spark, root).getOrElse(throw new IllegalStateException(
      s"no sealed index version under $root to compact"))
    publish(spark, root)(dest => compact(src, dest))
  }
}
