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

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertion that bucketing actually co-located the join.
    */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
