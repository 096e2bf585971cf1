package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-scoped upsert / CDC application — the incremental alternative to the
  * reference's full-recompute pipeline (SURVEY §7.4 risk 5: "dedup becomes
  * dropDuplicates within batch + key-scoped merge on write").
  *
  * Composition of the engine's own primitives: updates win over existing
  * rows (anti join), tombstones subtract last. With both sides bucketed on
  * the key (see [[Bucketing]]) the whole merge runs shuffle-free; otherwise
  * it costs one hash shuffle per side — still incremental-sized, not
  * full-history-sized, which is the point at 100 TB: a weekly export merges
  * in O(delta), not O(archive).
  */
object Upsert {

  /** New snapshot = updates ∪ (existing rows whose key is not updated),
    * minus tombstoned keys.
    */
  def apply(existing: DataFrame, updates: DataFrame, keys: Seq[String],
            deletes: Option[DataFrame] = None): DataFrame = {
    require(keys.nonEmpty, "upsert requires key columns")
    val updatedKeys = updates.select(keys.head, keys.tail: _*)
    val kept = existing.join(updatedKeys, keys, "left_anti")
    val merged = kept.unionByName(updates.select(existing.columns.map(col): _*))
    deletes match {
      case Some(d) => merged.join(d.select(keys.head, keys.tail: _*), keys, "left_anti")
      case None => merged
    }
  }

  /** Apply a batch of latest-wins changes when updates may themselves carry
    * duplicates: dedup the batch first (latest per key under `orderingCol`
    * descending), then merge.
    */
  def latestWins(existing: DataFrame, updates: DataFrame, keys: Seq[String],
                 orderingCol: String, deletes: Option[DataFrame] = None): DataFrame = {
    val dedupedUpdates = DedupLatest(updates, keys, Seq(col(orderingCol).desc))
    apply(existing, dedupedUpdates, keys, deletes)
  }

  /** Latest-wins merge of a CDC change batch that MIXES inserts and
    * tombstones (`deleteCol` boolean marks a tombstone): the per-key winner
    * is chosen by `orderingCol` across ALL change rows, so a delete followed
    * by a re-insert within one micro-batch keeps the key — applying
    * tombstones unconditionally would make the snapshot depend on where the
    * micro-batch boundary fell in the change log. The staleness guard is
    * symmetric: a winning tombstone only deletes an existing row whose
    * `orderingCol` is <= its own, and a winning upsert only replaces an
    * existing row whose `orderingCol` is <= its own — so a stale or replayed
    * change row (tombstone OR upsert) can never destroy a newer snapshot
    * row. Ties go to the change row, keeping whole-batch replay idempotent.
    * `existing` must carry `orderingCol` (snapshots written by this merge
    * do).
    */
  def applyChanges(existing: DataFrame, changes: DataFrame, keys: Seq[String],
                   orderingCol: String, deleteCol: String): DataFrame = {
    require(keys.nonEmpty, "upsert requires key columns")
    val winners = DedupLatest(changes, keys, Seq(col(orderingCol).desc))
    val isDel = coalesce(col(deleteCol), lit(false))
    val upserts = winners.where(!isDel).select(existing.columns.map(col): _*)
    val tombs = winners.where(isDel)
      .select(keys.map(col) :+ col(orderingCol).as("__del_ord"): _*)
    // latest-wins ACROSS existing ∪ upserts (not an unconditional anti-join
    // replace): an out-of-order or replayed upsert with an older orderingCol
    // loses to the newer snapshot row. Same one-hash-shuffle-per-side cost
    // as the anti-join shape on plain inputs — the window and the union
    // co-partition on keys — and robust to duplicate-key `existing` frames
    // (keeps the latest). Trade, stated: Union does not propagate its
    // children's partitioning, so over BUCKETED inputs this pays the one
    // exchange the anti-join avoided; `apply`/`latestWins` remain the
    // exchange-free path for bucketed snapshots that don't need the
    // stale-upsert guard.
    val merged = DedupLatest(
      existing.withColumn("__src", lit(0))
        .unionByName(upserts.withColumn("__src", lit(1))),
      keys, Seq(col(orderingCol).desc, col("__src").desc)).drop("__src")
    merged.join(tombs,
      keys.map(k => merged(k) === tombs(k)).reduce(_ && _) &&
        merged(orderingCol) <= tombs("__del_ord"),
      "left_anti")
  }
}
