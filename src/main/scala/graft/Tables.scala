package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers for reading the driver-provided testdata tables
  * (TESTDATA.md: TPC-H-ish star schema + events/documents/embeddings).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
