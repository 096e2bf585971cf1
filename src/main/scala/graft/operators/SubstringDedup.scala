package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN detection and removal — the substring-level
  * companion to [[TextDedup]]'s whole-document dedup (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better": boilerplate,
  * licenses, templated passages repeat across documents that are NOT
  * near-duplicates as wholes, and span-level removal is what actually
  * shrinks memorization).
  *
  * The reference formulation builds a corpus-wide suffix array — inherently
  * single-machine. The distributed re-expression: slide a `k`-token window
  * over every document, and call a window DUPLICATED when its exact k-gram
  * occurs in at least `minDocs` DISTINCT documents. The union of duplicated
  * windows approximates the suffix-array "duplicated substring ≥ k tokens"
  * set from below (every duplicated run of ≥ k tokens is covered by
  * duplicated windows; runs shorter than k are invisible — `k` is the
  * minimum match length, exactly the suffix-array tool's threshold).
  *
  * Within-doc repeats are deliberately NOT flagged (`minDocs` counts
  * distinct docs): self-repetition is a quality signal with its own operator
  * (`graft_repetition` / q59), and conflating the two makes both reports
  * ambiguous.
  *
  * Scale shape: the corpus text never shuffles — only `(id, pos, gram-hash)`
  * window rows. Duplicate detection is one hash-partitioned count-distinct
  * per gram hash (map-side partials; no all-pairs anything), the span
  * arithmetic is window functions partitioned BY DOCUMENT (parallel across
  * docs, never a global sort), and the interval list that rides back onto a
  * document row is bounded by that document's own window count.
  *
  * Grams are compared by 64-bit xxhash64, not by string: at 10^12 corpus
  * windows the expected number of colliding gram PAIRS is ~(10^12)^2 / 2^65
  * ≈ 3·10^4 — a ~3·10^-8 false-duplicate rate, negligible against the
  * sliver a real corpus's true duplicate rate represents, and the hash
  * halves-or-better the shuffle bytes a 50-byte gram string would cost.
  * (False POSITIVES only — a collision can spuriously mark a window
  * duplicated, never hide a real duplicate.)
  */
object SubstringDedup {

  /** `(id, __pos, __h)` — every k-token window, 1-based token position.
    * `hashGrams = false` carries the gram STRING as the key instead of its
    * xxhash64 (collision-free at string-sized shuffle cost — the
    * measurement is in DESIGN; ScaleSubstr is the rig).
    */
  private def windows(df: DataFrame, idCol: String, textCol: String,
                      k: Int, hashGrams: Boolean): DataFrame =
    df.select(col(idCol),
        posexplode(shinglesAllFast(col(textCol), k)).as(Seq("__p0", "__g")))
      .select(col(idCol), (col("__p0") + 1).as("__pos"),
        (if (hashGrams) xxhash64(col("__g")) else col("__g")).as("__h"))

  /** Duplicated windows `(id, __pos)`: window k-grams occurring in at least
    * `minDocs` distinct documents. With `keepFirst` the occurrences inside
    * each gram's lowest-id document are exempt (one canonical copy of the
    * duplicated text survives, everything else is flagged — the
    * keep-one-copy variant of Lee et al.'s remove-all default).
    */
  private[operators] def dupWindows(df: DataFrame, idCol: String, textCol: String,
                                    k: Int, minDocs: Int, keepFirst: Boolean,
                                    hashGrams: Boolean = true): DataFrame = {
    val w = windows(df, idCol, textCol, k, hashGrams)
    val dup = w.groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__nd"), min(col(idCol)).as("__keep"))
      .where(col("__nd") >= minDocs)
      .select(col("__h"), col("__keep"))
    if (keepFirst)
      w.join(dup, Seq("__h")).where(col(idCol) =!= col("__keep"))
        .select(col(idCol), col("__pos"))
    else
      w.join(dup.select("__h"), Seq("__h"), "left_semi")
        .select(col(idCol), col("__pos"))
  }

  /** Per-document duplicated-span report:
    * `(id, n_tokens, n_windows, n_dup_windows, covered_tokens, dup_frac)`
    * — how much of each document is text that also appears elsewhere in the
    * corpus. `covered_tokens` is the exact size of the UNION of the
    * duplicated windows' `[pos, pos+k-1]` intervals; since all intervals
    * share length k and arrive sorted by start, each window contributes
    * `min(k, nextStart - start)` uncovered-by-the-next tokens and the union
    * is one windowed `lead` + sum per document — no interval materialization.
    */
  def report(df: DataFrame, idCol: String, textCol: String, k: Int,
             minDocs: Int = 2, keepFirst: Boolean = false,
             hashGrams: Boolean = true): DataFrame = {
    val perDoc = Window.partitionBy(idCol).orderBy("__pos")
    val cov = dupWindows(df, idCol, textCol, k, minDocs, keepFirst, hashGrams)
      .withColumn("__next", lead("__pos", 1).over(perDoc))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(least(lit(k), coalesce(col("__next") - col("__pos"), lit(k))))
          .cast("long").as("covered_tokens"))
    df.select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"),
        greatest(tokenCount(col(textCol)) - lit(k - 1), lit(0))
          .cast("long").as("n_windows"))
      .join(cov, Seq(idCol), "left")
      .withColumn("n_dup_windows", coalesce(col("n_dup_windows"), lit(0L)))
      .withColumn("covered_tokens", coalesce(col("covered_tokens"), lit(0L)))
      .withColumn("dup_frac",
        when(col("n_tokens") > 0,
          round(col("covered_tokens").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)))
  }

  /** Rewrite each document with its duplicated spans CUT OUT: tokens covered
    * by any duplicated window are dropped, the survivors re-join with single
    * spaces (the same whitespace normalization [[tokens]] applies). Returns
    * the input columns with `textCol` replaced; documents with no duplicated
    * spans keep their original text verbatim.
    *
    * The merged-interval list per document is bounded by the document's own
    * duplicated-window count and rides back as an array column; the cut is a
    * single codegen'd higher-order-function pass over the token array — the
    * corpus text still never shuffles.
    */
  def removeSpans(df: DataFrame, idCol: String, textCol: String, k: Int,
                  minDocs: Int = 2, keepFirst: Boolean = false): DataFrame = {
    val perDoc = Window.partitionBy(idCol).orderBy("__pos")
    // gaps-and-islands: interval [p, p+k-1] merges with its predecessor when
    // p <= prevEnd + 1 = prevPos + k, so a NEW island starts iff
    // pos - prevPos > k
    val islands = dupWindows(df, idCol, textCol, k, minDocs, keepFirst)
      .withColumn("__prev", lag("__pos", 1).over(perDoc))
      .withColumn("__newi",
        when(col("__prev").isNull || col("__pos") - col("__prev") > k, 1)
          .otherwise(0))
      .withColumn("__isl", sum("__newi").over(
        perDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("__pos").as("__s"), (max("__pos") + lit(k - 1)).as("__e"))
      .groupBy(idCol)
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__ivs"))
    val others = df.columns.filterNot(_ == textCol).map(col)
    df.join(islands, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__ivs").isNull, col(textCol)).otherwise(concat_ws(" ",
          filter(
            zip_with(tokens(col(textCol)),
              sequence(lit(1), greatest(tokenCount(col(textCol)), lit(1))),
              (t, p) => when(
                exists(col("__ivs"), iv => p >= iv("__s") && p <= iv("__e")),
                lit(null).cast("string")).otherwise(t)),
            t => t.isNotNull))))
      .select(others :+ col(textCol): _*)
  }
}
