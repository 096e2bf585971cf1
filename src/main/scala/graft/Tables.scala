package graft

import org.apache.spark.sql.functions.{col, lit, timestamp_micros, unix_micros}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Helpers for reading the driver-provided testdata tables
  * (TESTDATA.md: TPC-H-ish star schema + events/documents/embeddings).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory. Event-time columns are
    * normalized (see [[normalizeEventTime]]) so downstream operators see one
    * type regardless of how the generator encoded timestamps.
    */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeEventTime(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Event-time portability: the driver's testdata has shipped `events.ts`
    * both as physical TIMESTAMP(NANOS) — which vanilla Spark only reads via
    * `spark.sql.legacy.parquet.nanosAsLong`, arriving as LongType epoch-ns —
    * and as TIMESTAMP_NTZ(µs), arriving as TimestampNTZType. The reference
    * likewise treats event-time encoding as data, not schema (it stores ISO
    * strings and parses at use; reference: src/glue/jobs/json_to_parquet.py).
    * All graft operators and oracle SQL assume epoch-nanosecond longs, so
    * convert any timestamp-typed `ts` here, at the single read boundary.
    *
    * Requires `spark.sql.session.timeZone=UTC` (all graft sessions set it):
    * the NTZ→TZ cast is interpreted in session-local time, and the DuckDB
    * oracle's `epoch_us(ts)` reads the stored naive value as UTC.
    *
    * Scale note: the conversion is a codegen'd per-row projection (no
    * shuffle), but it does sit between the scan and any `ts` predicate, so
    * range filters no longer push down to parquet row-groups. At 100 TB,
    * time-range queries should use [[readEventsFiltered]], which applies
    * the range to the RAW column first (or rely on partition pruning by
    * date), then normalize.
    */
  def normalizeEventTime(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn(c, unix_micros(col(c).cast(TimestampType)) * lit(1000L))
      case _ => df // already LongType epoch-ns, or no such column
    }

  /** Time-range read of the events table with the predicate applied to the
    * RAW `ts` column BEFORE [[normalizeEventTime]]'s projection — so the
    * range reaches the parquet scan (PushedFilters) and prunes row groups
    * by their min/max stats, whichever physical encoding the file carries.
    * Filtering the normalized column instead would scan every row group:
    * the normalize projection sits between the scan and the predicate and
    * blocks pushdown (the gap documented on [[normalizeEventTime]]).
    *
    * `[fromNs, toNs)` half-open, epoch nanoseconds. Bounds should be
    * µs-aligned: for a µs-encoded file [[denormalizeTs]] truncates them to
    * µs, so a sub-µs bound would admit rows from the truncated remainder
    * (and a µs-aligned bound classifies every row identically under both
    * encodings — which is also what keeps the DuckDB oracle, which reads
    * ns parquet at µs, in exact agreement).
    */
  def readEventsFiltered(spark: SparkSession, sfDir: String,
                         fromNs: Long, toNs: Long): DataFrame = {
    require(fromNs % 1000 == 0 && toNs % 1000 == 0,
      s"bounds must be µs-aligned epoch-ns (see scaladoc): $fromNs, $toNs")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val rawType = raw.schema.find(_.name == "ts")
      .getOrElse(throw new IllegalArgumentException("events has no ts column"))
      .dataType
    normalizeEventTime(raw.where(
      col("ts") >= denormalizeTs(rawType, fromNs) &&
      col("ts") < denormalizeTs(rawType, toNs)))
  }

  /** Inverse of [[normalizeEventTime]] for writing a value back in a raw
    * schema's type: epoch-ns long → whatever `rawType` the file carries.
    */
  def denormalizeTs(rawType: DataType, epochNs: Long): Column = rawType match {
    case LongType => lit(epochNs)
    case TimestampNTZType => timestamp_micros(lit(epochNs / 1000L)).cast(TimestampNTZType)
    case TimestampType => timestamp_micros(lit(epochNs / 1000L))
    case other => throw new IllegalArgumentException(s"unsupported ts type $other")
  }

  /** Standard local session config used by tests and ad-hoc mains.
    * shuffle.partitions=32 per the local[32] target; AQE coalesces
    * further at runtime so small inputs don't pay 32-task overhead.
    */
  def localSession(cores: Int = 4): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS) which vanilla Spark
      // rejects; read as LongType nanos and convert where needed.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // fresh warehouse per session: managed-table tests never collide with
      // leftovers from an earlier JVM
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    spark
  }
}
