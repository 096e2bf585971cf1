package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [nameSubstring] — the optional filter is for
    // local iteration only (the driver always passes exactly two args)
    val Array(sfDir, outDir) = args.take(2)
    val nameFilter = args.drop(2).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // SPARK_GRAFT_AQE=false runs the whole gate without adaptive
      // execution — proves no query's RESULT leans on AQE plan choices
      // (exchange reuse, runtime join selection); default on, as in prod
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(name.contains) }
    val failed = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      } finally {
        // queries are self-contained; without this, 165 entries' worth of
        // localCheckpoint/cache blocks accumulate in the block manager
        // and the tail of the run pays the eviction pressure
        Bench.releasePinnedBlocks(spark)
      }
    }
    // Loud failure contract: a query that throws must be impossible to miss
    // — r10 shipped 11 dead queries because this loop used to swallow them
    // to stderr and exit 0. Both stdout and stderr carry the summary; the
    // exit code carries it to the round loop.
    if (failed.nonEmpty) {
      val msg = s"[verify] FAILED ${failed.size}/${selected.size}: ${failed.mkString(", ")}"
      println(msg)
      System.err.println(msg)
    } else println(s"[verify] OK ${selected.size}/${selected.size}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
