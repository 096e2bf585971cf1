package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins: write both sides of a
  * recurring join bucketed on the join key and the shuffle disappears from
  * every subsequent join — the exchange is paid once at write time instead
  * of per query. This is the 100 TB answer for repeated fact-to-fact joins
  * (e.g. lineitem ⋈ orders every run): at 1000 executors a single avoided
  * shuffle of the big side dominates everything else in the plan.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    var w = df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no SHUFFLE exchange —
    * the assertion that bucketing actually co-located the join. Walks the
    * plan tree for ShuffleExchange nodes rather than string-matching
    * "Exchange", which would also match BroadcastExchange and misreport a
    * broadcast join over co-located tables as shuffled.
    */
  def isExchangeFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def hasShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst { case _: ShuffleExchangeLike => () }.isDefined ||
        // AQE hides its subtree behind a leaf wrapper — recurse into it
        p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
          .exists(hasShuffle)
    !hasShuffle(df.queryExecution.executedPlan)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
