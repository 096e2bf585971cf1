package graft

/** Time named `SparkEntry.queries` entries in a fresh session, printing
  * every rep (not just the min) — the isolation probe for attributing a
  * full-`Bench` regression to the query itself vs its position in the
  * suite (heap/cache state left behind by earlier queries). Pass a
  * comma-separated list to reproduce a suspected poisoning sequence.
  *
  * What this does NOT control for: machine load. The probe runs on the
  * same host, so background load inflates its numbers exactly as it
  * inflates the full suite's — an isolated reproduction is evidence of a
  * real regression only if `uptime` is also clean at measurement time
  * (the r8 q27 episode: 1.72 s isolated under residual session load,
  * 1.38 s isolated idle, 1.04 s in-suite idle — DESIGN.md note 20). Two
  * further calibration facts: isolated runs sit ~0.3–0.4 s above
  * in-suite (cold JIT + parquet footer/listing that earlier suite
  * queries pre-warm), and sub-second queries swing ±40–60 % run-to-run.
  *
  * Usage: runMain graft.BenchOne <name>[,<name>...] [reps] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(
      sys.error("usage: BenchOne <name>[,<name>...] [reps] [sfDir]"))
      .split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val warm = spark.read.parquet(s"$sfDir/lineitem.parquet")
    warm.groupBy("l_returnflag").count().count()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchone] $name rep $i = $dt%.3f s")
        dt
      }
      println(f"[benchone] $name min = ${times.min}%.3f s  median = ${times.sorted.apply(reps / 2)}%.3f s")
    }
    spark.stop()
  }
}
