package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface over a data directory: register every table as a temp view so
  * users can `spark.sql` against the lake — the user-facing query layer the
  * reference lacks (its "query surface" is fixed jobs; ours is full Spark
  * SQL + the graft_* native functions).
  */
object Lake {

  /** Register all testdata tables from `dir` as temp views; returns them. */
  def open(spark: SparkSession, dir: String,
           tables: Seq[String] = Tables.all): Map[String, DataFrame] = {
    GraftFunctions.register(spark)
    tables.map { t =>
      val df = Tables.read(spark, dir, t)
      df.createOrReplaceTempView(t)
      t -> df
    }.toMap
  }

  /** Register the relationalized children of a nested table as views too
    * (`{table}_{field}` naming, mirroring the parquet child datasets).
    */
  def openRelationalized(spark: SparkSession, df: DataFrame, rootName: String,
                         indexCols: Seq[String]): Map[String, DataFrame] = {
    val tables = operators.Relationalize(df, rootName, indexCols)
    tables.foreach { case (name, t) => t.createOrReplaceTempView(name) }
    tables
  }
}
