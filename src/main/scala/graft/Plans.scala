package graft
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(4)
    val dir = "/root/testdata/sf0.01"
    def show(name: String): Unit = {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).map(_.trim.take(160))
      println(s"=== $name")
      println("  joins: " + plan.linesIterator.filter(l => l.contains("Join")).map(_.trim.replaceAll("\\(\\d+\\)","").take(100)).mkString(" | "))
      pushed.foreach(l => println("  " + l))
      println("  wscg spans: " + plan.linesIterator.count(_.contains("WholeStageCodegen")))
    }
    Seq("q01_pricing_summary","q02_filter_pushdown","q03_join_revenue","q04_broadcast_join","q05_anti_join","q07_dedup_latest","q22_jaccard_pairs","q25_ann_topk","q42_asof_join","q43_band_join","q44_resample","q45_cosine_pairs","q12_compare_diff").foreach(show)
    spark.stop()
  }
}
