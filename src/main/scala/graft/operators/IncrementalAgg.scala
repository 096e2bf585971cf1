package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of per-group `(n, total)` aggregates under a
  * replace-upsert + tombstone delta — the materialized-view half of the
  * [[Upsert]]/[[graft.streaming.UpsertStream]] CDC pair. Instead of
  * re-scanning the (100 TB) base after every merge, the maintained
  * aggregate is corrected with O(delta) work:
  *
  *   1. old contributions of touched row ids are REMOVED (one semi-join of
  *      the snapshot against the broadcast delta ids — delta-sized output);
  *   2. new non-tombstone rows are ADDED;
  *   3. the ± contributions aggregate per group and full-outer-merge into
  *      the previous aggregate (groups emptied by deletes disappear).
  *
  * Count and sum are self-maintainable under deletion (avg = total/n);
  * min/max are NOT (deleting the min forces a per-group rescan) — that is
  * inherent to incremental view maintenance, not a gap: recompute affected
  * groups from the snapshot when you need extrema.
  *
  * Exactness: pass a DECIMAL value column and every +/- correction is
  * exact, so the maintained aggregate equals a from-scratch recompute
  * bit-for-bit (float sums would drift order-dependently). Contract:
  * `changes` holds at most one row per id ([[DedupLatest]] first — same
  * contract as [[Upsert.merge]]); rows with null `valueCol` count toward
  * `n` and contribute 0 to `total`.
  */
object IncrementalAgg {

  /** The from-scratch aggregate this operator maintains:
    * `(groupKeys..., n, total)`.
    */
  def full(base: DataFrame, groupKeys: Seq[String], valueCol: String): DataFrame =
    base.groupBy(groupKeys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col(valueCol), lit(0))).as("total"))

  /** Correct `prevAgg` (= [[full]] of `snapshot`) for `changes`, without
    * re-scanning the base: tombstone rows (`deleteCol` true) remove their
    * snapshot row's contribution; other rows replace-or-insert theirs.
    */
  def maintain(prevAgg: DataFrame, snapshot: DataFrame, changes: DataFrame,
               idKeys: Seq[String], groupKeys: Seq[String], valueCol: String,
               deleteCol: String = "__deleted"): DataFrame = {
    val isDel =
      if (changes.columns.contains(deleteCol)) coalesce(col(deleteCol), lit(false))
      else lit(false)
    // every changed id loses its old contribution (replace AND delete);
    // the id set is usually delta-sized, but nothing enforces that — leave
    // the join strategy to AQE, which broadcasts when the measured size fits
    // (spark.sql.autoBroadcastJoinThreshold) and degrades to a shuffled
    // semi-join otherwise instead of dying with a broadcast OOM
    val touched = changes.select(idKeys.map(col): _*).distinct()
    val removed = snapshot.join(touched, idKeys, "left_semi")
      .select(groupKeys.map(col) :+ lit(-1L).as("__sign") :+
        coalesce(col(valueCol), lit(0)).as("__v"): _*)
    val added = changes.where(!isDel)
      .select(groupKeys.map(col) :+ lit(1L).as("__sign") :+
        coalesce(col(valueCol), lit(0)).as("__v"): _*)
    val delta = removed.unionByName(added)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        sum(col("__sign") * col("__v")).as("__dtotal"))
    // delta touches few groups — AQE broadcasts it against the (much
    // larger) maintained aggregate; groups emptied by deletes drop out
    prevAgg.join(delta, groupKeys, "full_outer")
      .select(groupKeys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0)) + coalesce(col("__dtotal"), lit(0))).as("total")): _*)
      .where(col("n") > 0)
  }
}
