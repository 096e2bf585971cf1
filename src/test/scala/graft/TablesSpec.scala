package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import java.nio.file.Files

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

  test("denormalizeTs round-trips through every supported raw type") {
    for (t <- Seq[DataType](LongType, TimestampType, TimestampNTZType)) {
      val df = spark.range(1).select(Tables.denormalizeTs(t, epochNs).as("ts"))
      assert(df.schema("ts").dataType === t, s"raw type $t")
      val back = Tables.normalizeEventTime(df).select("ts").as[Long].head()
      assert(back === epochNs, s"round-trip through $t")
    }
  }
}
