package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget packing: assign ordered rows to fixed-budget training
  * windows by running weight (token) count — a row lands in the window its
  * tokens START in, so a window can overflow by at most one row (streaming
  * packing semantics, the shape q69 oracle-checks).
  *
  * The naive formulation is one `Window.partitionBy(stratum)` running sum:
  * correct, but its parallelism equals the number of strata — at 100 TB a
  * 5-language corpus becomes 5 unsplittable sort-the-whole-stratum tasks.
  * [[tokenWindows]] instead packs each stratum in `subStrata` parallel
  * range slices and stitches them with per-slice prefix totals:
  *
  *   1. slice boundaries = approx quantiles of the order column (one
  *      map-side-combined aggregation pass; ANY order-preserving split
  *      yields the identical final result, so approx is enough and the
  *      boundary pass never needs to be exact or even deterministic);
  *   2. each (stratum, slice) runs its local running sum in parallel —
  *      tasks are now corpus/(strata×subStrata), not corpus/strata;
  *   3. slice totals (strata×subStrata tiny rows) prefix-sum in one
  *      window over the slice-total table, and each slice's local cums
  *      shift by its prefix offset — a broadcast join, no second pass.
  *
  * The result is EXACTLY the single-window assignment (PackSpec asserts
  * equality), with the heavy shuffle keyed on (stratum, slice).
  */
object Pack {

  /** Rows of `df` plus `cum`: the running weight sum within `strataCol`
    * ordered by `orderCol`, computed with the range-sliced parallel
    * formulation above (never one task per stratum). `orderCol` must be
    * numeric-orderable and unique within a stratum; `weightCol` is cast to
    * long. Shared backbone of [[tokenWindows]] and
    * [[Mix.capTokens]]-style quota operators.
    */
  def runningTokens(df: DataFrame, strataCol: String, orderCol: String,
                    weightCol: String, subStrata: Int = 32): DataFrame = {
    require(subStrata >= 1, s"subStrata must be >= 1, got $subStrata")
    val w = col(weightCol).cast("long")
    val withSub = assignSlices(df, strataCol, orderCol, subStrata)
    val wLocal = Window.partitionBy(col(strataCol), col("__sub"))
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withSub.withColumn("__local_cum", sum(w).over(wLocal))
    // slice totals: strata x subStrata rows — the prefix window is tiny
    val wPrefix = Window.partitionBy(col(strataCol)).orderBy(col("__sub").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withSub.groupBy(col(strataCol), col("__sub"))
      .agg(sum(w).as("__tot"))
      .withColumn("__offset", coalesce(sum(col("__tot")).over(wPrefix), lit(0L)))
      .select(col(strataCol), col("__sub"), col("__offset"))
    local.join(broadcast(offsets), Seq(strataCol, "__sub"))
      .withColumn("cum", col("__local_cum") + col("__offset"))
      .drop("__sub", "__local_cum", "__offset")
  }

  /** Rows of `df` with two added columns: `cum` (running weight sum within
    * `strataCol`, ordered by `orderCol`) and `win` (`(cum - weight) div
    * budget` — the packing window id). `orderCol` must be numeric-orderable
    * and unique within a stratum (a row id); `weightCol` is cast to long.
    */
  def tokenWindows(df: DataFrame, strataCol: String, orderCol: String,
                   weightCol: String, budget: Long,
                   subStrata: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    runningTokens(df, strataCol, orderCol, weightCol, subStrata)
      .withColumn("win",
        expr(s"(cum - CAST(`$weightCol` AS BIGINT)) DIV CAST($budget AS BIGINT)"))
  }

  /** One-pass sequence-length ablation (the packing twin of
    * [[graft.quality.FilterSweep]]): for each candidate `seqLen`, how much
    * padding does PER-DOCUMENT packing waste (each doc rounded up to whole
    * sequences — the no-cross-doc-attention regime) and how many sequences
    * does concat-and-chunk emit. Choosing the training sequence length is
    * exactly the kind of ablation that naively re-runs the packer per
    * candidate over the full corpus; here per-doc token counts are
    * computed once and crossed with the broadcast length grid — all
    * integer arithmetic, so the oracle is bit-exact. Shuffle: K result
    * rows.
    */
  def paddingSweep(docs: DataFrame, weightCol: String,
                   seqLens: Seq[Int]): DataFrame = {
    require(seqLens.nonEmpty && seqLens.forall(_ > 0), "seqLens must be > 0")
    val s = docs.sparkSession
    import s.implicits._
    val g = broadcast(seqLens.toDF("seq_len"))
    // integer ceil via DIV — Column./ is DOUBLE division, which loses
    // exactness past 2^53 tokens; 0 sequences for empty docs
    val nSeq = expr("(__nt + seq_len - 1) DIV seq_len")
    docs.select(col(weightCol).cast("long").as("__nt"))
      .crossJoin(g)
      .groupBy("seq_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        sum(nSeq).as("n_seqs_padded"),
        sum(nSeq * col("seq_len").cast("long") - col("__nt"))
          .as("n_pad_tokens"))
      .withColumn("pad_frac",
        when(col("n_seqs_padded") === 0L, lit(0.0)).otherwise(
          round(col("n_pad_tokens").cast("double") /
            (col("n_seqs_padded").cast("double") * col("seq_len")), 6)))
      .withColumn("n_seqs_concat",
        expr("(n_tokens + seq_len - 1) DIV seq_len"))
      .orderBy("seq_len")
  }

  /** `df` plus `__sub`: an order-preserving slice id in `[0, subStrata)` —
    * every row in slice s has `orderCol` <= every row in slice s+1 (rows
    * equal to a boundary land below it). Boundaries come from one
    * `approx_percentile` pass; skipped entirely when `subStrata == 1`.
    */
  private[operators] def assignSlices(df: DataFrame, strataCol: String,
                                      orderCol: String, subStrata: Int): DataFrame =
    if (subStrata <= 1) df.withColumn("__sub", lit(0))
    else {
      val probs = array((1 until subStrata).map(i =>
        lit(i.toDouble / subStrata)): _*)
      // boundaries MATERIALIZED to a local relation (the
      // Bm25.localQueryTerms shape): percentile_approx is an approximate
      // aggregate, and runningTokens references the sliced frame from TWO
      // consumers (local cums and slice offsets) — left lazy, the
      // correctness of the stitch would silently ride on exchange reuse
      // computing the SAME boundaries for both; any split is correct, but
      // only if both sides see the same one. Strata-sized by contract.
      val boundsDf = df.groupBy(col(strataCol))
        .agg(percentile_approx(col(orderCol), probs, lit(10000)).as("__bnds"))
      val rows = boundsDf.limit(100001).collect()
      require(rows.length <= 100000,
        s"$strataCol has over 100k strata — runningTokens' slice-boundary " +
          "table must stay broadcastable; use a coarser stratum")
      val bounds = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), boundsDf.schema)
      df.join(broadcast(bounds), Seq(strataCol))
        .withColumn("__sub",
          size(filter(col("__bnds"), b => b < col(orderCol))))
        .drop("__bnds")
    }
}
