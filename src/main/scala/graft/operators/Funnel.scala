package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics over an event stream: for each user, the
  * earliest strictly-ordered completion of `steps` (step k's event strictly
  * after step k-1's) with the whole chain inside `window` time units of the
  * first step — the standard product-analytics conversion funnel.
  *
  * Spark-first plan: one join + partial-agg pair per step, all equi-shuffled
  * on the user key, so consecutive stages reuse the same hash partitioning
  * (no re-shuffle under AQE) and the frame narrows as the funnel does. Per
  * step the join's right side is the (user, t_first..t_k) accumulator —
  * funnel-sized, shrinking, broadcast-able when conversion is low. No
  * windows over whole-user event timelines, so a power user with millions
  * of events never forms one giant sort partition; cost is bounded by
  * events of the step's type.
  *
  * "Earliest completion" is the standard greedy semantics: t1 = user's
  * first step-1 event; t_k = first step-k event after t_{k-1} and within
  * `window` of t1. Greedy earliest times maximize completion: any valid
  * chain implies the greedy one exists.
  */
object Funnel {

  /** Per-user step completion times: columns `(userCol, t1..tN)` — `t_k`
    * null when the user never completed step k. Users absent from step 1
    * are absent entirely. `tsCol` must be numeric (e.g. epoch micros).
    */
  def stepTimes(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, steps: Seq[String], window: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(window > 0, s"window must be positive, got $window")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    var i = 1
    while (i < steps.size) {
      val prevT = s"t$i"
      val nextT = s"t${i + 1}"
      // candidate events for step i+1: the user's step-type events strictly
      // after their t_i and within the funnel window of t1 — join keeps only
      // users still in the funnel (t_i non-null), then one min per user
      val candidates = events.where(col(typeCol) === steps(i))
        .select(col(userCol), col(tsCol).as("__ts"))
        .join(acc.select(col(userCol), col("t1"), col(prevT)), Seq(userCol))
        .where(col("__ts") > col(prevT) && col("__ts") <= col("t1") + window)
        .groupBy(col(userCol)).agg(min(col("__ts")).as(nextT))
      // left join: drop-offs stay, with a null completion time
      acc = acc.join(candidates, Seq(userCol), "left")
      i += 1
    }
    acc
  }

  /** Step-level conversion counts: `(step_idx, step, n_users)`, one row per
    * step, n_users = users whose chain reached that step.
    */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String], window: Long): DataFrame = {
    val times = stepTimes(events, userCol, tsCol, typeCol, steps, window)
    val counts = times.agg(
      count(col("t1")).as("c1"),
      (2 to steps.size).map(k => count(col(s"t$k")).as(s"c$k")): _*)
    counts.select(posexplode(array(steps.indices.map(k =>
        struct(lit(k + 1).as("step_idx"), lit(steps(k)).as("step"),
          col(s"c${k + 1}").as("n_users"))): _*)).as(Seq("__p", "e")))
      .select(col("e.step_idx"), col("e.step"), col("e.n_users"))
      .orderBy("step_idx")
  }
}
