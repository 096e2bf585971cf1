package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed dataset diff — the reference's staging-vs-production compare,
  * re-expressed as a single full-outer join instead of single-node pandas.
  *
  * Reference semantics: `compare_datasets_and_output_report` +
  * `compare_datasets_by_data_type`
  * (`/root/reference/src/glue/jobs/compare_parquet_datasets.py:554-731`):
  * join both sides on the type's index fields with exact equality
  * (abs_tol=0, rel_tol=0), report rows only-in-left, only-in-right, matched
  * rows, per-column mismatch counts, and duplicate-key rows per side; plus
  * column-name set differences (`:159-182`) and validity checks (`:619-642`).
  *
  * Scale notes: the reference materializes both datasets in pandas on one
  * node (`to_pandas`, `:686-698`) — its stated scalability ceiling. Here both
  * sides stay distributed: one shuffle per side on the join key, per-column
  * mismatch counts fold into a single aggregation over the joined result, and
  * Catalyst prunes unreferenced columns from the scans.
  */
object CompareDatasets {

  /** Column-set analysis (reference `get_missing_cols`/`get_additional_cols`). */
  case class ColumnDiff(common: Seq[String], onlyLeft: Seq[String], onlyRight: Seq[String])

  def columnDiff(left: DataFrame, right: DataFrame): ColumnDiff = {
    val l = left.columns.toSeq
    val r = right.columns.toSet
    val ls = l.toSet
    ColumnDiff(l.filter(r.contains), l.filterNot(r.contains),
      right.columns.toSeq.filterNot(ls.contains))
  }

  /** Reference `get_duplicated_columns` + empty check (`check_for_valid_dataset`). */
  def validate(df: DataFrame): Unit = {
    val dups = df.columns.groupBy(identity).collect { case (c, arr) if arr.length > 1 => c }
    require(dups.isEmpty, s"duplicated column names: ${dups.mkString(",")}")
    require(!df.isEmpty, "dataset is empty")
  }

  /** Rows whose key occurs more than once on one side
    * (reference `get_duplicates`, `compare_parquet_datasets.py:488-507`).
    */
  def duplicateKeyRows(df: DataFrame, keys: Seq[String]): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).count().where(col("count") > 1)
      .select(keys.map(col): _*)
    df.join(counts, keys, "left_semi")
  }

  /** One-row summary: counts of common / left-only / right-only rows and
    * per-column exact-mismatch counts over common rows. Null-safe equality
    * (`<=>`) matches datacompy's NaN-equals-NaN exact compare.
    *
    * Duplicate keys pair positionally (datacompy's cumcount semantics): each
    * side gets a per-key occurrence index — ordered by the compared columns
    * for determinism — so a key occurring twice on each side contributes
    * exactly two compared row-pairs, never four. Rows with null join keys
    * (which can never match) are counted as left-only / right-only.
    *
    * Plan shape: both sides UNION into one tagged stream; one window pass
    * assigns the per-key occurrence index, and one groupBy on
    * `(key, dup_idx)` pairs the two sides via max-of-struct — 2 shuffles
    * total (window + pairing groupBy), versus the naive formulation's two
    * per-side windows plus a re-shuffling full-outer join (4). At 100 TB the
    * saved shuffle is a full pass over both datasets.
    */
  def summary(left: DataFrame, right: DataFrame, keys: Seq[String],
              compareCols: Seq[String]): DataFrame = {
    val paired = pairRows(left, right, keys, compareCols)
    val inLeft = col("__s0").isNotNull
    val inRight = col("__s1").isNotNull
    val aggs: Seq[Column] =
      Seq(
        sum(when(inLeft && inRight, 1L).otherwise(0L)).as("n_common"),
        sum(when(inLeft && !inRight, 1L).otherwise(0L)).as("n_left_only"),
        sum(when(!inLeft && inRight, 1L).otherwise(0L)).as("n_right_only")) ++
        compareCols.map(c =>
          sum(when(inLeft && inRight && !(col(s"__s0.$c") <=> col(s"__s1.$c")), 1L)
            .otherwise(0L)).as(s"n_mismatch_$c"))
    paired.agg(aggs.head, aggs.tail: _*)
  }

  /** Positional side-pairing shared by [[summary]] and [[mismatchRows]]:
    * one row per paired slot, `__s0`/`__s1` structs null when that side is
    * absent. Using ONE pairing for both keeps the counts and the row-level
    * detail consistent — an inner join here would cross-product duplicate
    * keys (n·m joined rows where the summary counts min(n, m) pairs) and
    * the diff CSV would disagree with its own report header.
    */
  private def pairRows(left: DataFrame, right: DataFrame, keys: Seq[String],
                       compareCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // when there are no compared columns (sides share only the key),
    // duplicate rows within a key are indistinguishable — any stable
    // ordering works, and an empty orderBy would be an AnalysisException
    val dupOrder = if (compareCols.nonEmpty) compareCols else keys
    def tagged(df: DataFrame, side: Int): DataFrame =
      df.select((keys ++ compareCols).map(col) :+ lit(side).as("__side"): _*)
    val unioned = tagged(left, 0).unionByName(tagged(right, 1))

    val nullKey = keys.map(col(_).isNull).reduce(_ || _)
    val w = Window.partitionBy((keys.map(col) :+ col("__side")): _*)
      .orderBy(dupOrder.map(col): _*)
    // null join keys can never match, but groupBy treats nulls as equal —
    // give null-key rows side-disjoint indexes (even left, odd right) so
    // they never pair. Deterministic (window row_number), unlike a
    // monotonically_increasing_id, whose values change on stage retry and
    // would re-route rows across reduce partitions mid-recovery.
    val rn = row_number().over(w)
    val indexed = unioned.withColumn("__dup_idx",
      when(nullKey, rn * 2 + col("__side")).otherwise(rn))

    // pair the sides: per (key, dup_idx) each side contributes <=1 row
    // (null-key rows get unique ids above, so they never pair); the struct
    // marker distinguishes "row absent" from "value is null"
    def packed(side: Int) =
      max(when(col("__side") === side,
        struct(lit(1).as("p") +: compareCols.map(col): _*))).as(s"__s$side")
    indexed.groupBy(keys.map(col) :+ col("__dup_idx"): _*)
      .agg(packed(0), packed(1))
  }

  /** Per-key mismatch detail over common keys: key cols + one boolean per
    * compared column (true = differs). Used by the row-diff CSVs. Duplicate
    * keys pair positionally through the SAME pairing as [[summary]], so the
    * emitted rows are exactly the pairs the summary counted as mismatched
    * (datacompy's cumcount semantics) — not an inner-join cross product.
    */
  def mismatchRows(left: DataFrame, right: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    // nothing to compare (sides share only the keys) → no mismatch rows;
    // the unguarded reduce below would otherwise throw at plan time
    if (compareCols.isEmpty) return left.select(keys.map(col): _*).limit(0)
    val paired = pairRows(left, right, keys, compareCols)
    val flags = compareCols.map(c =>
      (!(col(s"__s0.$c") <=> col(s"__s1.$c"))).as(s"diff_$c"))
    paired.where(col("__s0").isNotNull && col("__s1").isNotNull)
      .select(keys.map(col) ++ flags: _*)
      .where(compareCols.map(c => col(s"diff_$c")).reduce(_ || _))
  }

  /** Export-scoped filter construction (reference V1,
    * `get_exports_filter_values`/`convert_filter_values_to_expression`,
    * `compare_parquet_datasets.py:372-451`): OR over cohorts of
    * (cohort == c AND export_end_date IN dates).
    */
  def exportsFilter(filterValues: Map[String, Seq[String]],
                    cohortCol: String = "cohort",
                    dateCol: String = "export_end_date"): Column =
    filterValues.toSeq.sortBy(_._1).map { case (c, dates) =>
      col(cohortCol) === lit(c) && col(dateCol).isin(dates: _*)
    }.reduceOption(_ || _).getOrElse(lit(true))
}
