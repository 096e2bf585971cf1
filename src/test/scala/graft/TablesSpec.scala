package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Event-time portability: the driver's testdata has shipped `events.ts`
  * as both physical TIMESTAMP(NANOS)-read-as-long and TIMESTAMP_NTZ(µs)
  * across regenerations (the r10 outage). Downstream code assumes epoch-ns
  * longs; these specs pin the single normalization boundary.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val epochNs = 1700000000123456000L // µs-aligned: survives NTZ(µs)

  test("normalizeEventTime: long-ns column passes through untouched") {
    val df = Seq((1L, epochNs)).toDF("event_id", "ts")
    val out = Tables.normalizeEventTime(df)
    assert(out.schema("ts").dataType === LongType)
    assert(out.select("ts").as[Long].head() === epochNs)
  }

  test("normalizeEventTime: TIMESTAMP_NTZ(µs) parquet arrives as epoch-ns long") {
    val dir = Files.createTempDirectory("graft_ntz_").toString
    val ntz = spark.createDataFrame(
      java.util.List.of(Row(1L,
        java.time.LocalDateTime.ofEpochSecond(
          epochNs / 1000000000L, (epochNs % 1000000000L).toInt,
          java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampNTZType))))
    ntz.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rawType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(rawType === TimestampNTZType, s"fixture must be NTZ, got $rawType")
    val out = Tables.read(spark, dir, "events")
    assert(out.schema("ts").dataType === LongType)
    // session tz is UTC, so the naive value IS the epoch — same convention
    // as the DuckDB oracle's epoch_us(ts)
    assert(out.select("ts").as[Long].head() === epochNs)
  }

  test("readEventsFiltered: range reaches the parquet scan as PushedFilters, both encodings") {
    val base = 1700000000000000000L // µs-aligned
    def rows(mk: Long => Any, tsType: DataType, dir: String): Unit = {
      val data = (0 until 100).map(i =>
        Row(i.toLong, mk(base + i * 1000000000L)))
      spark.createDataFrame(data.asJava,
          StructType(Seq(StructField("event_id", LongType),
            StructField("ts", tsType))))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val cases = Seq[(String, Long => Any, DataType)](
      // raw long epoch-ns (the TIMESTAMP(NANOS)-as-long encoding)
      ("long-ns", ns => ns, LongType),
      // TIMESTAMP_NTZ(µs)
      ("ntz-us", ns => java.time.LocalDateTime.ofEpochSecond(
        ns / 1000000000L, (ns % 1000000000L).toInt,
        java.time.ZoneOffset.UTC), TimestampNTZType))
    for ((label, mk, tsType) <- cases) {
      val dir = Files.createTempDirectory(s"graft_evf_$label").toString
      rows(mk, tsType, dir)
      val from = base + 10L * 1000000000L
      val to = base + 20L * 1000000000L
      val out = Tables.readEventsFiltered(spark, dir, from, to)
      // correctness: half-open range, normalized to epoch-ns longs
      assert(out.schema("ts").dataType === LongType, label)
      val ids = out.select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === (10L until 20L).toSeq, s"$label: $ids")
      // the predicate must land in the SCAN (row-group pruning at 100 TB),
      // not above the normalize projection
      val scans = out.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      assert(scans.nonEmpty, s"$label: no file scan in plan")
      val pushed = scans.map(_.metadata("PushedFilters")).mkString
      assert(pushed.contains("ts"),
        s"$label: ts range not pushed to parquet: $pushed")
      // and the un-helped path (filter AFTER Tables.read's normalize)
      // genuinely does NOT push — the gap readEventsFiltered exists for
      val unhelped = Tables.read(spark, dir, "events")
        .where(col("ts") >= from && col("ts") < to)
      val unpushed = unhelped.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .map(_.metadata("PushedFilters")).mkString
      if (tsType == LongType)
        // long-ns passes through normalize untouched, so Catalyst CAN
        // still push this one — only assert on the projected encoding
        ()
      else
        assert(!unpushed.replace("IsNotNull(ts)", "").contains("ts"),
          s"$label: expected the normalized path NOT to push the range " +
          s"(doc premise), got: $unpushed")
    }
  }

  test("denormalizeTs round-trips through every supported raw type") {
    for (t <- Seq[DataType](LongType, TimestampType, TimestampNTZType)) {
      val df = spark.range(1).select(Tables.denormalizeTs(t, epochNs).as("ts"))
      assert(df.schema("ts").dataType === t, s"raw type $t")
      val back = Tables.normalizeEventTime(df).select("ts").as[Long].head()
      assert(back === epochNs, s"round-trip through $t")
    }
  }
}
