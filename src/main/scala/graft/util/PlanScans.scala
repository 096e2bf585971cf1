package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-plan introspection shared by the scale rigs and the
  * plan-assertion specs: collect the parquet file scans of a (possibly
  * adaptive) executed plan. AQE wraps finalized stages in
  * `AdaptiveSparkPlanExec`/`QueryStageExec` nodes whose children are NOT
  * on `children`, so a naive `collect` misses every scan — this walker
  * unwraps them. Kept in main (not test) sources because the scale rigs
  * report planned-bytes from it.
  */
object PlanScans {

  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ kids.flatMap(fileScans)
  }

  /** File scans of `df`'s executed plan whose scan root path contains
    * `pathSubstr`. Execute an action first — AQE only finalizes stages
    * (and reveals the real scans) after one.
    */
  def fileScansOf(df: DataFrame, pathSubstr: String): Seq[FileSourceScanExec] =
    fileScans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(pathSubstr)))
}
