package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full comparison report (reference V3,
  * `compare_datasets_by_data_type` + report assembly,
  * `/root/reference/src/glue/jobs/compare_parquet_datasets.py:590-731`):
  * renders the row-match stats / column diff / duplicate sections as text and
  * writes the four row-level CSVs, all computed distributed (the reference
  * materializes both sides in pandas on one node).
  */
object CompareReport {

  final case class Report(summaryText: String,
                          mismatchRows: DataFrame,
                          leftOnlyRows: DataFrame,
                          rightOnlyRows: DataFrame,
                          duplicatesLeft: DataFrame,
                          duplicatesRight: DataFrame)

  def build(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftName: String = "staging", rightName: String = "main"): Report = {
    CompareDatasets.validate(left)
    CompareDatasets.validate(right)
    val cd = CompareDatasets.columnDiff(left, right)
    val compareCols = cd.common.filterNot(keys.contains)
    val sumRow = CompareDatasets.summary(left, right, keys, compareCols).collect().head

    val nCommon = sumRow.getAs[Long]("n_common")
    val nLeft = sumRow.getAs[Long]("n_left_only")
    val nRight = sumRow.getAs[Long]("n_right_only")
    val mismatches = compareCols.map(c => c -> sumRow.getAs[Long](s"n_mismatch_$c"))
    val dupL = CompareDatasets.duplicateKeyRows(left, keys)
    val dupR = CompareDatasets.duplicateKeyRows(right, keys)

    val text =
      s"""Column comparison
         |-----------------
         |Columns in common (${cd.common.size}): ${cd.common.mkString(", ")}
         |Columns only in $leftName (${cd.onlyLeft.size}): ${cd.onlyLeft.mkString(", ")}
         |Columns only in $rightName (${cd.onlyRight.size}): ${cd.onlyRight.mkString(", ")}
         |
         |Row comparison (join on ${keys.mkString(", ")})
         |--------------------------------
         |Rows in common: $nCommon
         |Rows only in $leftName: $nLeft
         |Rows only in $rightName: $nRight
         |
         |Column mismatch counts over common rows
         |---------------------------------------
         |${mismatches.map { case (c, n) => f"$c%-40s $n" }.mkString("\n")}
         |
         |Columns with no mismatches: ${mismatches.count(_._2 == 0L)} / ${mismatches.size}
         |""".stripMargin

    Report(text,
      CompareDatasets.mismatchRows(left, right, keys, compareCols),
      left.join(right.select(keys.map(col): _*), keys, "left_anti"),
      right.join(left.select(keys.map(col): _*), keys, "left_anti"),
      dupL, dupR)
  }

  /** Write the report like the reference does: one txt + row-level CSVs.
    * Row-diff output order is randomized like the reference's sample-all
    * shuffle (A6, `compare_row_diffs`, `compare_parquet_datasets.py:510-532`).
    * The txt goes through the Hadoop FileSystem API — the CSVs already do
    * (Spark writers), and a driver-local `java.nio` write would silently
    * split the report across filesystems the moment `outDir` is a shared
    * path (s3a://, hdfs://) on a real cluster.
    */
  def write(report: Report, outDir: String, shuffleRows: Boolean = true): Unit = {
    def csv(df: DataFrame, name: String): Unit = {
      val out = if (shuffleRows) df.orderBy(rand(42)) else df
      out.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/$name")
    }
    val spark = report.mismatchRows.sparkSession
    val (fs, dir) = graft.pipeline.Snapshots.fsFor(spark, outDir)
    fs.mkdirs(dir)
    val txt = fs.create(new org.apache.hadoop.fs.Path(dir, "comparison_report.txt"), true)
    try txt.write(report.summaryText.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally txt.close()
    csv(report.mismatchRows, "rows_with_diffs")
    csv(report.leftOnlyRows, "rows_only_in_left")
    csv(report.rightOnlyRows, "rows_only_in_right")
    csv(report.duplicatesLeft, "duplicated_rows_left")
    csv(report.duplicatesRight, "duplicated_rows_right")
  }
}
