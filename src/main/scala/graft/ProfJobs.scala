package graft

/** Per-query action/stage-count audit (measurement-side only): run each
  * named `SparkEntry.queries` entry once untimed (cold builds land there),
  * then attach a listener and time reps while counting Spark jobs, stages,
  * and summed executor task time. The jobs/rep number is the §1.2 "don't
  * compute things you throw away" audit — a query whose wall time is
  * dominated by job-count overhead at sf0.1 shows up as many tiny jobs
  * with low task-time totals.
  *
  * Usage: runMain graft.ProfJobs <name>[,<name>...] [reps] [sfDir]
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(
      sys.error("usage: ProfJobs <name>[,<name>...] [reps] [sfDir]"))
      .split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
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
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    val warm = spark.read.parquet(s"$sfDir/lineitem.parquet")
    warm.groupBy("l_returnflag").count().count()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      fn(spark, sfDir).count() // untimed cold pass (store builds)
      Bench.releasePinnedBlocks(spark)
      (1 to reps).foreach { i =>
        spark.sparkContext.listenerBus.waitUntilEmpty()
        val (j0, s0, t0n, m0) = (jobs.get, stages.get, tasks.get, taskMs.get)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.listenerBus.waitUntilEmpty()
        println(f"[profjobs] $name rep $i = $dt%.3f s  jobs=${jobs.get - j0} " +
          f"stages=${stages.get - s0} tasks=${tasks.get - t0n} " +
          f"taskTime=${(taskMs.get - m0) / 1e3}%.1f s")
      }
      Bench.releasePinnedBlocks(spark)
    }
    spark.stop()
  }
}
