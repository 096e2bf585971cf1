package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed dedup — keep exactly one (the newest) record per logical key.
  *
  * Reference semantics: `drop_table_duplicates`
  * (`/root/reference/src/glue/jobs/json_to_parquet.py:175-221`): partition by
  * the type's index fields, order by `InsertedDate DESC, export_end_date DESC`
  * when the table has an `InsertedDate` column, else `export_end_date DESC`,
  * keep `row_number() == 1`.
  *
  * Scale notes: `row_number` over a key window is a single hash shuffle on the
  * key columns — the minimum possible for exact latest-per-key. Spark plans it
  * as a partial sort within partitions (no global sort). For heavily skewed
  * keys enable AQE skew handling; for 100 TB the shuffle is unavoidable but
  * map-side nothing is dropped, so prefer filtering/pruning before dedup.
  */
object DedupLatest {

  /** Generic form: keep first row per `keys` under `ordering`. */
  def apply(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "dedup requires at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Skew-resistant two-phase variant for pathological hot keys: phase 1
    * takes the per-(key, salt) winner — the salt spreads one hot key over
    * `saltBuckets` reducers — and phase 2 reduces the surviving
    * `saltBuckets` candidates per key to the global winner. Same result as
    * [[apply]] for any total `ordering`; use when one key holds a
    * disproportionate share of rows (DESIGN.md "skew defenses").
    */
  def salted(df: DataFrame, keys: Seq[String], ordering: Seq[Column],
             saltBuckets: Int = 64): DataFrame = {
    val salt = (rand(42) * saltBuckets).cast("int")
    val phase1 = apply(df.withColumn("__graft_salt", salt),
      keys :+ "__graft_salt", ordering)
    apply(phase1, keys, ordering).drop("__graft_salt")
  }

  /** Reference-faithful form: InsertedDate (if present) then export_end_date,
    * both descending.
    */
  def latestExport(df: DataFrame, keys: Seq[String]): DataFrame = {
    val ordering =
      (if (df.columns.contains("InsertedDate")) Seq(col("InsertedDate").desc) else Nil) :+
        col("export_end_date").desc
    apply(df, keys, ordering)
  }
}
