package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming replacement for the reference's event-driven Lambda
  * chain (SURVEY §1.1 "Streams"): a file-source stream with
  * `Trigger.AvailableNow` processes whatever exports have landed and stops —
  * same batch semantics, but with checkpointed exactly-once file tracking
  * instead of SNS/SQS bookkeeping (reference
  * `src/lambda_function/s3_to_glue/app.py:116-158`).
  *
  * Scale notes: the file source lists incrementally and checkpoints progress;
  * `maxFilesPerTrigger` bounds batch size. Dedup here is within-stream
  * (`dropDuplicates` keyed on the logical key with a watermark bounding
  * state); cross-run dedup stays in the batch pipeline (or a MERGE-capable
  * table format) per SURVEY §7.4 risk 5.
  */
object StreamingIngest {

  /** Ingest NDJSON files appearing under `inputDir` into a partitioned
    * parquet dataset, applying a transform stage. Runs to completion
    * (AvailableNow) and returns the finished query.
    */
  def ingestAvailableNow(spark: SparkSession, inputDir: String, schema: StructType,
                         outputDir: String, checkpointDir: String,
                         transform: DataFrame => DataFrame = identity,
                         partitionCols: Seq[String] = Seq("cohort")): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1000)
      .json(inputDir)
    val out = transform(stream)
    val writer = out.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
    // a requested partition column the transform dropped (or a typo) must
    // fail loudly — silently landing the dataset unpartitioned makes every
    // downstream partition-pruned reader full-scan with no signal
    val missing = partitionCols.filterNot(out.columns.contains)
    require(missing.isEmpty,
      s"partition column(s) ${missing.mkString(", ")} absent from the " +
      s"transformed stream (columns: ${out.columns.mkString(", ")}); " +
      "pass partitionCols = Seq.empty to write unpartitioned")
    val q = (if (partitionCols.nonEmpty)
      writer.partitionBy(partitionCols: _*) else writer).start()
    q.awaitTermination()
    q
  }

  /** Watermarked event-time windowed aggregation over a stream with a long
    * `ts` nanoseconds column (the `events` table shape): counts + sum per
    * (window, event_type). Late data beyond the watermark is dropped —
    * bounded state at any scale.
    */
  def windowedEventCounts(stream: DataFrame, window: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    stream
      .withColumn("event_time", expr("timestamp_micros(ts DIV 1000)"))
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Run a windowed aggregation over files already on disk via AvailableNow
    * and collect the final result from the sink directory.
    */
  def aggregateAvailableNow(spark: SparkSession, inputDir: String, schema: StructType,
                            outputDir: String, checkpointDir: String,
                            watermark: String = "2 hours",
                            maxFilesPerTrigger: Int = 1000): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).json(inputDir)
    val agg = windowedEventCounts(stream, watermark = watermark)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val q = agg.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
