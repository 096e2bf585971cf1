package graft.streaming

import graft.SparkSpec
import graft.ingest.Transforms
import org.apache.spark.sql.types._

import java.io.File
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("GlobalKey", StringType),
    StructField("v", IntegerType),
    StructField("cohort", StringType)))

  test("AvailableNow file-source ingestion writes partitioned parquet exactly once") {
    val tmp = Files.createTempDirectory("graft_stream_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    Files.writeString(new File(in, "a.ndjson").toPath,
      """{"GlobalKey":"g1","v":1,"cohort":"adults_v1"}
        |{"GlobalKey":"g2","v":2,"cohort":"pediatric_v1"}""".stripMargin)

    val out = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    StreamingIngest.ingestAvailableNow(spark, in.getAbsolutePath, schema, out, ckpt)
    assert(spark.read.parquet(out).count() === 2)

    // second run with no new files: checkpoint prevents re-processing
    StreamingIngest.ingestAvailableNow(spark, in.getAbsolutePath, schema, out, ckpt)
    assert(spark.read.parquet(out).count() === 2)

    // a new file is picked up incrementally
    Files.writeString(new File(in, "b.ndjson").toPath,
      """{"GlobalKey":"g3","v":3,"cohort":"adults_v1"}""")
    StreamingIngest.ingestAvailableNow(spark, in.getAbsolutePath, schema, out, ckpt)
    assert(spark.read.parquet(out).count() === 3)
    assert(spark.read.parquet(out).where("cohort = 'adults_v1'").count() === 2)
  }

  test("watermarked hourly aggregation over the events stream shape") {
    val tmp = Files.createTempDirectory("graft_stream_agg_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    val h0 = 1704067200000000000L // 2024-01-01T00:00:00 in ns
    val h1 = h0 + 3600L * 1000000000L
    val h2 = h0 + 7200L * 1000000000L
    // Three files -> three micro-batches (maxFilesPerTrigger=1): append-mode
    // windows only emit once the watermark passes their end, so a sentinel
    // event in a later hour closes the earlier windows.
    Files.writeString(new File(in, "a_ev.ndjson").toPath,
      s"""{"event_id":1,"ts":$h0,"event_type":"click","value":1.5}
         |{"event_id":2,"ts":${h0 + 60000000000L},"event_type":"click","value":2.5}""".stripMargin)
    Files.writeString(new File(in, "b_ev.ndjson").toPath,
      s"""{"event_id":3,"ts":$h1,"event_type":"view","value":1.0}""")
    Files.writeString(new File(in, "c_ev.ndjson").toPath,
      s"""{"event_id":4,"ts":$h2,"event_type":"sentinel","value":0.0}""")
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val out = s"$tmp/out"
    StreamingIngest.aggregateAvailableNow(spark, in.getAbsolutePath, evSchema, out,
      s"$tmp/ckpt", watermark = "0 seconds", maxFilesPerTrigger = 1)
    val res = spark.read.parquet(out).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toInstant.toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    // windows whose end <= final watermark (02:00) are emitted
    assert(res === Set(
      ("2024-01-01T00:00:00Z", "click", 2L),
      ("2024-01-01T01:00:00Z", "view", 1L)))
  }
}
