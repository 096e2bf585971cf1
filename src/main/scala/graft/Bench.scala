package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: every `SparkEntry.queries` entry timed on
  * `SPARK_GRAFT_SF_DIR`, one JSON line on stdout plus a file copy.
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPS` times (default 3) and the
  * MINIMUM is reported: local[_] timings at sub-second scale wobble with
  * JIT/GC/page-cache noise, and min-of-N is the standard way to read a
  * cold-start-free steady-state number. The total is the sum of the
  * per-query minimums.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    // Warm up JIT/codegen/parquet-reader paths so the first timed query
    // doesn't absorb one-time session costs.
    try {
      val warm = spark.read.parquet(s"$sfDir/lineitem.parquet")
      warm.groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
        // failures surface as -1.0 so a broken query can never read as a speedup
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}"""
    println(line)
    // also persist to a file: the driver captures a bounded log TAIL, which
    // has clipped this (single, long) line mid-JSON in past rounds. The path
    // is overridable (and absolute-capable) because the JVM's CWD is the
    // driver's choice, not ours; parents are created so the write can't
    // silently degrade when target/ doesn't exist yet.
    val outPath = java.nio.file.Paths.get(
      sys.props.get("graft.bench.out")
        .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
        .getOrElse("target/bench.json"))
    try {
      Option(outPath.toAbsolutePath.getParent)
        .foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(outPath, line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    spark.stop()
  }
}
