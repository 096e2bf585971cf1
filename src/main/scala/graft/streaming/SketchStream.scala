package graft.streaming

import graft.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming maintenance of a per-group KLL sketch table — the incremental
  * form of q52's store-daily/merge-at-query-time pattern: each micro-batch
  * sketches ONLY its own rows, then merges those sketch bytes into the
  * running per-group sketches. Per batch the work is O(batch + groups); the
  * raw history is never re-read, which is the whole point of mergeable
  * sketches at 100 TB — a percentile dashboard stays current at stream
  * latency with shuffle traffic proportional to the number of groups, not
  * the number of rows ever seen.
  *
  * Exactly-once: same protocol as [[UpsertStream]] — checkpointed file
  * intake, versioned snapshot dirs (batch N writes `v{N}`, merging from the
  * latest complete version BELOW N, so a retried batch never reads the
  * output it is about to overwrite), `_SUCCESS`-gated readers.
  */
object SketchStream {

  /** Maintained snapshot schema: groupCols..., `n` (exact row count),
    * `sk` (binary KLL sketch of `valueCol`).
    */
  def run(spark: SparkSession, changesDir: String, schema: StructType,
          snapshotDir: String, checkpointDir: String,
          groupCols: Seq[String], valueCol: String, k: Int = 200,
          retainVersions: Int = 3): StreamingQuery = {
    GraftFunctions.register(spark)
    val stream = spark.readStream.schema(schema).json(changesDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // refuse a fresh checkpoint over an existing snapshot root (silent
        // rebuild-from-empty otherwise) — same protocol as UpsertStream
        if (batchId == 0L)
          graft.pipeline.Snapshots.guardLineage(spark, snapshotDir, checkpointDir)
        val batchSk = batch
          .groupBy(groupCols.map(col): _*)
          .agg(call_function("graft_kll_sketch", col(valueCol), lit(k)).as("sk"),
            count(col(valueCol)).as("n"))
        val prev = currentBefore(spark, snapshotDir, maxExclusive = Some(batchId))
        // merge-by-union: one shuffle on the group key over (groups_prev +
        // groups_batch) sketch ROWS — never raw history. graft_kll_merge
        // unions the sketch bytes; new groups and untouched groups both fall
        // out of the same aggregation.
        val merged = prev.map(_.unionByName(batchSk)).getOrElse(batchSk)
          .groupBy(groupCols.map(col): _*)
          .agg(call_function("graft_kll_merge", col("sk")).as("sk"),
            sum(col("n")).as("n"))
        merged.write.mode("overwrite").parquet(s"$snapshotDir/v$batchId")
        // retention: without it a long-running stream leaves every
        // superseded snapshot on disk — O(batches x snapshot) storage.
        // keep >= 2 so a retried batch still finds its merge base below
        // its own id
        graft.pipeline.Snapshots.prune(spark, snapshotDir,
          math.max(retainVersions, 2))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** The latest complete sketch snapshot, if any. */
  def current(spark: SparkSession, snapshotDir: String): Option[DataFrame] =
    currentBefore(spark, snapshotDir, maxExclusive = None)

  /** Per-group quantiles read straight off a sketch snapshot — O(groups),
    * no raw data access.
    */
  def quantiles(snapshot: DataFrame, groupCols: Seq[String],
                probs: Seq[Double]): DataFrame = {
    GraftFunctions.register(snapshot.sparkSession)
    // percent-rounded names must stay distinct — p=0.995 and p=1.0 would
    // both render "p100" and the duplicate column breaks any select/write
    // downstream with an ambiguity error far from the cause
    val names = probs.map(p => s"p${(p * 100).round}")
    require(names.distinct.size == names.size,
      s"quantile probs ${probs.mkString(", ")} collide after percent " +
      s"rounding (${names.mkString(", ")}); space probs at least 0.01 apart")
    snapshot.select(groupCols.map(col) ++ Seq(col("n")) ++
      probs.zip(names).map { case (p, n) =>
        call_function("graft_kll_value", col("sk"), lit(p)).as(n) }: _*)
  }

  private def currentBefore(spark: SparkSession, snapshotDir: String,
                            maxExclusive: Option[Long]): Option[DataFrame] = {
    val versions = graft.pipeline.Snapshots.versions(spark, snapshotDir, completeOnly = true)
      .filter { case (v, _) => maxExclusive.forall(v < _) }
    if (versions.isEmpty) None
    else Some(spark.read.parquet(versions.maxBy(_._1)._2.toString))
  }
}
