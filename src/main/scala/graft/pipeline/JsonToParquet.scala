package graft.pipeline

import graft.operators.{DedupLatest, DropDeleted, Relationalize}
import graft.schema.SchemaRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's core per-data-type job (`json_to_parquet.main`,
  * `/root/reference/src/glue/jobs/json_to_parquet.py:629-745`), restated
  * Spark-first:
  *
  * {{{ scan → count(READ) → dedupLatest → [antiJoinDeleted] → relationalize
  *     → archive previous output → write partitioned parquet → count(WRITE) }}}
  *
  * One JVM process; the only wide stages are the dedup window shuffle and the
  * (AQE-broadcast) tombstone anti join. Output sizing uses
  * `maxRecordsPerFile` instead of the reference's count-then-coalesce, which
  * removes one full extra pass over the data.
  */
object JsonToParquet {

  /** Pipeline-stage record-count events (reference `CountEventType`,
    * `json_to_parquet.py:419-443`).
    */
  object Stage extends Enumeration {
    val Read, DropDuplicates, DropDeletedSamples, Write = Value
  }

  /** @param cleanup releases the cached post-dedup DataFrame; `run` calls it
    *                 after the sinks, callers of `transform` own it otherwise
    *                 (30 data types in one session would otherwise pin 30
    *                 cached datasets in executor storage).
    */
  final case class JobResult(tables: Map[String, DataFrame], counts: DataFrame,
                             cleanup: () => Unit = () => ())

  /** Run the transformation chain lazily (no sink): returns the parent +
    * child tables and the lineage-count DataFrame (A2: per-export_end_date
    * row counts per stage, tagged).
    */
  def transform(spark: SparkSession, dataType: String, input: DataFrame,
                deleted: Option[DataFrame]): JobResult = {
    val key = dataType.toLowerCase
    val indexFields = SchemaRegistry.indexFieldMap.getOrElse(key,
      throw new IllegalArgumentException(s"no index fields for $dataType"))

    var counts = stageCounts(spark, input, dataType, Stage.Read)

    val deduped = DedupLatest.latestExport(input, indexFields).cache()
    counts = counts.unionByName(stageCounts(spark, deduped, dataType, Stage.DropDuplicates))

    val afterDeletes =
      if (SchemaRegistry.hasTombstone(dataType)) {
        val res = DropDeleted(deduped, deleted, indexFields)
        counts = counts.unionByName(stageCounts(spark, res, dataType, Stage.DropDeletedSamples))
        res
      } else deduped

    val tables =
      if (Relationalize.hasNestedFields(afterDeletes.schema))
        Relationalize(afterDeletes, dataType.toLowerCase,
          indexFields ++ Seq("cohort", "ParticipantID"))
      else Map(dataType.toLowerCase -> afterDeletes)

    counts = counts.unionByName(
      stageCounts(spark, tables(dataType.toLowerCase), dataType, Stage.Write))
    JobResult(tables, counts, () => { deduped.unpersist(); () })
  }

  /** A2 — `groupBy(export_end_date).count()` tagged with type and stage
    * (reference `count_records_for_event`, `json_to_parquet.py:446-489`).
    */
  def stageCounts(spark: SparkSession, df: DataFrame, dataType: String,
                  stage: Stage.Value): DataFrame = {
    val base =
      if (df.columns.contains("export_end_date")) df.groupBy("export_end_date").count()
      else df.groupBy(lit(null).cast("string").as("export_end_date")).count()
    base.withColumn("data_type", lit(dataType))
      .withColumn("event", lit(stage.toString))
  }

  /** Full job with sinks: write each table as a NEW snapshot version
    * (partitioned by cohort), store counts as CSV (reference
    * `store_record_counts`).
    *
    * The version history under each table root replaces the reference's
    * archive-then-overwrite rename dance ([[Archiver]]): a crash mid-write
    * leaves readers on the previous complete version ([[Snapshots]] —
    * `_SUCCESS`-gated resolution, atomic on object stores where rename is
    * not). Read the published table with
    * `Snapshots.read(spark, s"$outputRoot/parquet/dataset_$name")`.
    * `keepVersions` bounds the history (None = keep all, the reference's
    * archive-forever behavior).
    */
  def run(spark: SparkSession, dataType: String, input: DataFrame,
          deleted: Option[DataFrame], outputRoot: String, runId: String,
          maxRecordsPerFile: Long = 1000000L,
          keepVersions: Option[Int] = None): JobResult = {
    val result = transform(spark, dataType, input, deleted)
    result.tables.foreach { case (name, df) =>
      val target = s"$outputRoot/parquet/dataset_$name"
      Snapshots.writeNew(df, target) { w =>
        val sized = w.option("maxRecordsPerFile", maxRecordsPerFile)
        if (df.columns.contains("cohort")) sized.partitionBy("cohort") else sized
      }
      keepVersions.foreach(k => Snapshots.prune(spark, target, k))
    }
    result.counts.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .csv(s"$outputRoot/record_counts/dataset_${dataType.toLowerCase}")
    result.cleanup()
    result
  }

  /** Catalog-coerced scan (reference S4 `get_table`,
    * `json_to_parquet.py:131-172`): declared schema wins; crawler-style
    * `partition_*` artifacts are dropped.
    */
  def scan(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = spark.read.schema(schema).json(path)
    val crawlerCols = df.columns.filter(_.startsWith("partition_"))
    if (crawlerCols.isEmpty) df else df.drop(crawlerCols.toIndexedSeq: _*)
  }

  /** Scan with a malformed-record audit trail: PERMISSIVE parse keeps the
    * raw text of any line that failed the declared schema in a corrupt
    * column (the "corrupt-record column for audit" noted in SURVEY §4's
    * schema-conflict row — the reference only *logs* transform fallbacks,
    * `s3_to_json.py:291-348`). Returns (clean rows, corrupt raw lines,
    * cleanup): the source is cached because Spark disallows filtering a
    * JSON scan on the corrupt column alone, and the returned cleanup
    * hook unpersists THAT cached base — the caller could not otherwise
    * release it (unpersisting the two derived frames does not evict the
    * shared base plan, and clearCache() evicts everyone's).
    */
  def scanAudited(spark: SparkSession, path: String,
                  schema: StructType): (DataFrame, DataFrame, () => Unit) = {
    import org.apache.spark.sql.functions.col
    val corruptCol = "_corrupt_record"
    val df = spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache()
    val crawlerCols = df.columns.filter(_.startsWith("partition_"))
    val base = if (crawlerCols.isEmpty) df else df.drop(crawlerCols.toIndexedSeq: _*)
    (base.where(col(corruptCol).isNull).drop(corruptCol),
      base.where(col(corruptCol).isNotNull).select(col(corruptCol).as("raw_line")),
      () => { df.unpersist(); () })
  }
}
