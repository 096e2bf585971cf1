package graft

/** Print the formatted physical plan of named `SparkEntry.queries` entries
  * — the per-operator plan-audit loop (pushdown reaching the scan,
  * broadcasts where expected, no surprise exchanges, wide
  * WholeStageCodegen spans). Audit companion to [[BenchOne]]'s timings.
  *
  * Usage: runMain graft.Explain <name>[,<name>...] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(
      sys.error("usage: Explain <name>[,<name>...] [sfDir]")).split(",").toSeq
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      println(s"\n===== $n =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
