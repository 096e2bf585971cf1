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
}
