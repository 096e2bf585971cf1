package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-corruption sample prep (the T5 denoising objective, Raffel et al.
  * 2020): mask contiguous token spans and emit `(input, target)` pairs —
  * the input keeps unmasked text with one sentinel per masked span, the
  * target lists each sentinel with the tokens it hides. Unlike the paper's
  * RNG draws, span starts and lengths here are HASHED coins over
  * `(seed, doc, position)` — the same sample set on any cluster layout,
  * retry, or partition count, which is what makes a 100 TB preprocessing
  * run resumable and auditable (and lets a SQL oracle reproduce it
  * bit-for-bit).
  *
  * Rates: a span starts at a position with probability `1/startPeriod`
  * and runs `1..maxSpan` tokens (uniform), so the expected corruption
  * rate is `(maxSpan+1)/(2*startPeriod)` — the T5 defaults (15%, mean
  * span 3) correspond to `startPeriod=20, maxSpan=5` at ~15%.
  *
  * SENTINEL BUDGET: span ids are unbounded here, but T5-family vocabs
  * ship exactly 100 `<extra_id_k>` sentinels — a document past roughly
  * `startPeriod * 100` tokens (~2000 at the defaults) overflows that
  * budget. Apply this operator AFTER chunking to the training sequence
  * length (the pipeline order q68 → here), exactly as the original
  * preprocesses fixed-length inputs; consumers can also filter on the
  * emitted `n_spans` column.
  *
  * Scale shape: narrow per-token projections plus per-document windows
  * (partitioned by doc id — parallel across docs, no global window), then
  * one groupBy(doc) reassembly. Token rows shuffle once, carrying
  * `(doc, pos, piece)` — the same shape as substring-dedup's rebuild.
  * Overlapping or touching spans merge into maximal masked runs, so a
  * sentinel never repeats mid-span.
  */
object SpanCorrupt {

  def corrupt(docs: DataFrame, idCol: String, textCol: String,
              seed: Long = 42L, startPeriod: Int = 20,
              maxSpan: Int = 5): DataFrame = {
    require(startPeriod > 0 && maxSpan > 0, "startPeriod, maxSpan > 0")
    val id = col(idCol)
    // 16-bit coins are enough here: the moduli are the small constants
    // startPeriod / maxSpan, where the bias is ~2^-16
    def coin(salt: String) = hashCoin(seed, salt,
      concat(id.cast("string"), lit(":"), col("pos").cast("string")))
    val tok = docs.select(id,
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val flagged = tok
      .withColumn("__start", coin("s") % startPeriod === 0)
      .withColumn("__end", when(col("__start"),
        col("pos") + lit(1) + coin("l") % maxSpan))
    val masked = flagged
      // a position is masked iff some span that started at or before it
      // is still running: running max of span ends (exclusive) exceeds it
      .withColumn("__runEnd", max(col("__end")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__m", coalesce(col("__runEnd") > col("pos"), lit(false)))
      // islands = maximal masked runs (touching spans merge)
      .withColumn("__runStart",
        col("__m") && !coalesce(lag(col("__m"), 1).over(w), lit(false)))
      .withColumn("__isl",
        sum(col("__runStart").cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
    val sentinel = concat(lit("<extra_id_"), col("__isl"), lit(">"))
    val pieces = masked.select(id, col("pos"), col("__m"), col("__runStart"),
      when(!col("__m"), col("w"))
        .when(col("__runStart"), sentinel).as("__inp"),
      when(col("__m"),
        when(col("__runStart"), concat(sentinel, lit(" "), col("w")))
          .otherwise(col("w"))).as("__tgt"))
    def joined(c: String) = array_join(filter(transform(
      array_sort(collect_list(struct(col("pos"), col(c).as("p")))),
      x => x("p")), _.isNotNull), " ")
    val out = pieces.groupBy(idCol).agg(
      joined("__inp").as("input_text"),
      joined("__tgt").as("target_text"),
      sum(col("__m").cast("long")).as("n_masked"),
      sum(col("__runStart").cast("long")).as("n_spans"))
    docs.select(id).join(out, Seq(idCol), "left")
      .select(id,
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }
}
