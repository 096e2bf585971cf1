package graft.operators

import org.apache.spark.sql.DataFrame

/** Tombstone subtraction — remove rows whose key appears in a companion
  * `*_Deleted` table.
  *
  * Reference semantics: `drop_deleted_healthkit_data`
  * (`/root/reference/src/glue/jobs/json_to_parquet.py:224-301`): the deleted
  * table is deduped first, then the main table is left-anti joined on the
  * type's index fields; an empty tombstone table is a no-op, a missing one is
  * an error (modeled here with `Option`).
  *
  * Scale notes: tombstone tables are tiny relative to the data; Spark's AQE
  * converts the anti join to a broadcast join at runtime. We keep the plan
  * declarative (plain `left_anti`) so Catalyst/AQE pick broadcast-hash when
  * the deleted side fits, falling back to shuffled hash join when it doesn't.
  */
object DropDeleted {

  def apply(table: DataFrame, deleted: Option[DataFrame], keys: Seq[String]): DataFrame =
    deleted match {
      case None => throw new IllegalArgumentException(
        s"tombstone table missing for keys ${keys.mkString(",")}")
      case Some(d) if d.isEmpty => table
      case Some(d) =>
        val dd = DedupLatest.latestExport(d, keys)
        table.join(dd.select(keys.head, keys.tail: _*), keys, "left_anti")
    }

  /** [[apply]] with the main table Bloom-split before the anti join
    * ([[BloomPrune.prunedAntiJoin]]): rows whose key tuple is provably not
    * tombstoned bypass the join without ever shuffling. Identical result;
    * the anti join's exchange carries only the tombstone-matching fraction
    * (+ Bloom false positives) of the table. The right shape when the table
    * is 100 TB and the weekly deleted set is delta-sized but past the
    * comfortable broadcast threshold — the regime where AQE would otherwise
    * fall back to shuffling the full table for a shuffled hash anti join.
    */
  def pruned(table: DataFrame, deleted: Option[DataFrame], keys: Seq[String]): DataFrame =
    deleted match {
      case None => throw new IllegalArgumentException(
        s"tombstone table missing for keys ${keys.mkString(",")}")
      case Some(d) if d.isEmpty => table
      case Some(d) =>
        val dd = DedupLatest.latestExport(d, keys)
        BloomPrune.prunedAntiJoin(table, dd.select(keys.head, keys.tail: _*), keys)
    }
}
