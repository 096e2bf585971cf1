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
}
