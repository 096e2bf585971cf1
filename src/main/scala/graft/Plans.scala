package graft
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(4)
    val dir = "/root/testdata/sf0.01"
    def show(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, dir)
      // AQE only finalizes (and reveals WholeStageCodegen spans) after an
      // action — execute before reading the plan
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).map(_.trim.take(160))
      println(s"=== $name")
      println("  joins: " + plan.linesIterator.filter(l => l.contains("Join")).map(_.trim.replaceAll("\\(\\d+\\)","").take(100)).mkString(" | "))
      pushed.foreach(l => println("  " + l))
      // Spark 4 renders codegen'd operators with a `*` prefix in the
      // executed-plan string rather than WholeStageCodegen wrapper lines
      println("  codegen'd ops: " + plan.linesIterator.count(l =>
        l.contains("- *") || l.trim.startsWith("*")))
    }
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary","q02_filter_pushdown","q03_join_revenue","q04_broadcast_join","q05_anti_join","q07_dedup_latest","q22_jaccard_pairs","q25_ann_topk","q42_asof_join","q43_band_join","q44_resample","q45_cosine_pairs","q12_compare_diff","q52_approx_quantiles","q53_funnel","q54_incremental_agg","q55_group_sample","q59_repetition","q60_cms_freq","q62_quantized_ann","q63_bloom_join")
    names.foreach(show)
    spark.stop()
  }
}
