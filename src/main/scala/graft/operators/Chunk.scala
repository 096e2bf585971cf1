package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Passage chunking — split long documents into overlapping fixed-size
  * token windows, the preparation step shared by RAG passage stores,
  * long-document training (context-window packing wants units that fit),
  * and embedding pipelines (encoders cap input length). The stride <
  * chunk overlap preserves cross-boundary context the way HF tokenizers'
  * `return_overflowing_tokens` does.
  *
  * Chunk `c` covers tokens `[c·stride, min(c·stride + chunkTokens, n))`;
  * the chunk count is `1 + max(0, ⌈(n − chunkTokens) / stride⌉)` — every
  * token lands in at least one chunk, the final chunk may run short, and
  * no chunk starts at or past the end. Empty docs (zero tokens) emit
  * nothing.
  *
  * Scale shape: pure per-row projection — tokenize once, then
  * `explode(sequence(...))` + `slice`; NO shuffle, no window, no join.
  * Chunk ids are deterministic `(doc, position)` pairs, so reruns and
  * retries are idempotent by construction.
  */
object Chunk {

  /** `(all input columns, chunk_id, n_chunks, tok_start, tok_len,
    * chunk_text)` — `chunk_text` re-joins the window's tokens with single
    * spaces (the tokenizer-space form downstream embedders see; original
    * whitespace is not reconstructed). Null text behaves like empty text:
    * the row emits no chunks (spec-pinned).
    */
  def slidingTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens >= 1: $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride in [1, chunkTokens]: $stride")
    val owned = Seq("n_chunks", "chunk_id", "tok_start", "tok_len",
      "chunk_text", "__ts")
    val clash = df.columns.toSet.intersect(owned.toSet)
    require(clash.isEmpty,
      s"slidingTokens owns output columns ${owned.mkString(", ")}; input " +
        s"already has ${clash.mkString(", ")} — rename before chunking")
    val n = size(col("__ts")).cast("long")
    val nChunks = lit(1L) + greatest(lit(0L),
      expr(s"(CAST(size(__ts) AS BIGINT) - $chunkTokens + ${stride - 1}) DIV $stride"))
    df.withColumn("__ts", tokens(col(textCol)))
      .where(size(col("__ts")) >= 1)
      .withColumn("n_chunks", nChunks)
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("tok_start", col("chunk_id") * stride)
      .withColumn("tok_len",
        least(lit(chunkTokens.toLong), n - col("tok_start")))
      .withColumn("chunk_text", concat_ws(" ",
        slice(col("__ts"), (col("tok_start") + 1).cast("int"),
          col("tok_len").cast("int"))))
      .drop("__ts")
  }
}
