package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fill-in-the-middle sample prep (Bavarian et al. 2022, "Efficient
  * Training of Language Models to Fill in the Middle"): split a document
  * at two token boundaries into (prefix, middle, suffix) and emit the PSM
  * rearrangement `<pre> P <suf> S <mid> M` — the decoder-only infilling
  * objective, companion to [[SpanCorrupt]]'s encoder-decoder denoising.
  * Applied to a hashed half of documents (the paper's 50% FIM rate);
  * the rest pass through in natural order, flagged.
  *
  * [[splitMixed]] adds the paper's SPM variant — suffix first, then
  * prefix, then middle (`<suf> S <pre> P <mid> M` in this string-level
  * analogue) — drawn 50/50 among applied documents by one extra mode
  * coin, the joint PSM+SPM training mixture the paper recommends over
  * either mode alone.
  *
  * Like [[SpanCorrupt]], every random draw is an md5 coin over
  * `(seed, doc)` — reproducible on any layout/retry, SQL-replayable to
  * the byte. Scale shape: pure per-row projections on the token array —
  * no explode, no window, no shuffle at all; the cheapest operator in
  * the pipeline.
  */
object Fim {

  /** PSM-only split: `(id, fim_text, n_prefix, n_middle, n_suffix,
    * fim_applied)`.
    */
  def split(docs: DataFrame, idCol: String, textCol: String,
            seed: Long = 42L): DataFrame =
    assemble(docs, idCol, textCol, seed, withMode = false)

  /** PSM/SPM mixture: [[split]]'s columns plus `fim_mode` ∈
    * (`psm`, `spm`, `none`) — applied documents draw the mode from an
    * independent coin, pass-throughs report `none`.
    */
  def splitMixed(docs: DataFrame, idCol: String, textCol: String,
                 seed: Long = 42L): DataFrame =
    assemble(docs, idCol, textCol, seed, withMode = true)

  private def assemble(docs: DataFrame, idCol: String, textCol: String,
                       seed: Long, withMode: Boolean): DataFrame = {
    val id = col(idCol)
    // 60-bit coins: the boundary draws are mod (n+1), and a narrow coin
    // would hard-truncate boundaries and bias the low positions for long
    // docs — the width must dwarf every realistic document length
    def coin(salt: String) = hashCoin(seed, salt, id, widthHex = 15)
    val toks = tokens(col(textCol))
    val n = size(toks).cast("long")
    val applied = (coin("f") % 2 === 0) && n >= 2L
    // two independent boundary draws in [0, n]; (u, v) ordered
    val a = coin("a") % (n + 1L)
    val b = coin("b") % (n + 1L)
    val u = least(a, b).cast("int")
    val v = greatest(a, b).cast("int")
    val pre = slice(toks, lit(1), u)
    val mid = slice(toks, u + 1, v - u)
    val suf = slice(toks, v + 1, n.cast("int") - v)
    // flatten drops nothing; empty segments contribute no tokens, so the
    // sentinels stay single-spaced
    val psm = array_join(flatten(array(
      array(lit("<pre>")), pre, array(lit("<suf>")), suf,
      array(lit("<mid>")), mid)), " ")
    val spm = array_join(flatten(array(
      array(lit("<suf>")), suf, array(lit("<pre>")), pre,
      array(lit("<mid>")), mid)), " ")
    val mode =
      if (!withMode) lit("psm")
      else when(!applied, lit("none"))
        .otherwise(when(coin("m") % 2 === 0, lit("spm")).otherwise(lit("psm")))
    val rearranged = if (!withMode) psm
      else when(mode === "spm", spm).otherwise(psm)
    val base = Seq(
      id,
      when(applied, rearranged).otherwise(array_join(toks, " ")).as("fim_text"),
      when(applied, size(pre)).otherwise(n.cast("int")).cast("long")
        .as("n_prefix"),
      when(applied, size(mid)).otherwise(0).cast("long").as("n_middle"),
      when(applied, size(suf)).otherwise(0).cast("long").as("n_suffix"),
      applied.as("fim_applied"))
    docs.select(
      (if (withMode) base :+ mode.as("fim_mode") else base): _*)
  }
}
