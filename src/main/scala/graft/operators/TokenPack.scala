package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-length training-sequence assembly — the pretraining pipeline's
  * final mile (GPT-style "concat and chunk": Brown et al. 2020 §2.1; every
  * open pretraining stack ships the same step). The corpus's piece streams
  * concatenate in document order and split into back-to-back `seqLen`-token
  * sequences; a document can span two sequences and a sequence several
  * documents, so each output row carries `doc_starts` — the in-sequence
  * offsets where a new document begins, exactly what attention-reset /
  * loss-masking needs downstream.
  *
  * [[Pack.tokenWindows]] (q69) is the DOCUMENT-level packer: no token ever
  * leaves its row, windows overflow by up to one document. This operator is
  * the token-EXACT variant: every sequence except the last has exactly
  * `seqLen` tokens, which requires materializing one row per token. That
  * cost is honest and unavoidable for split-exact packing — and it is the
  * same O(total tokens) the downstream tokenized-dataset write pays anyway.
  * Shape: one range-sliced parallel running index over the token stream
  * ([[Pack.runningTokens]] with a constant stratum — parallelism from its
  * `subStrata` slices), then one shuffle keyed on `seq_id` whose groups are
  * bounded at `seqLen` rows by construction. No global sort, no window over
  * the full stream in one task.
  *
  * Determinism: the stream order is `(idCol, position)` via an exact
  * arithmetic encoding (`id * maxDocPieces + pos` — bounds checked, refuses
  * rather than silently wrapping), so the same corpus always packs into the
  * same sequences.
  */
object TokenPack {

  /** Pack `piecesCol` (array of tokens per document) into `seqLen`-token
    * sequences. Returns `(seq_id, pieces, doc_starts, n_tokens, n_docs)`;
    * `doc_starts` lists in-sequence offsets (0-based) holding the FIRST
    * piece of a document. `idCol` must be a non-negative numeric document
    * id, unique per row — it defines the concatenation order.
    */
  def sequences(docs: DataFrame, idCol: String, piecesCol: String,
                seqLen: Int, subStrata: Int = 32): DataFrame = {
    require(seqLen > 0, s"seqLen > 0: $seqLen")
    val bounds = docs.agg(
      max(size(col(piecesCol))).as("maxLen"),
      min(col(idCol).cast("long")).as("minId"),
      max(col(idCol).cast("long")).as("maxId")).head()
    if (bounds.isNullAt(0)) return emptyResult(docs, piecesCol)
    val maxLen = math.max(bounds.getInt(0), 1).toLong
    val (minId, maxId) = (bounds.getLong(1), bounds.getLong(2))
    require(minId >= 0, s"$idCol must be non-negative for order encoding: $minId")
    // the encoding's max value is maxId * maxLen + (maxLen - 1) — guard
    // the FULL expression, not just the product, or the boundary id's
    // last tokens wrap negative and sort first
    require(maxId <= (Long.MaxValue - (maxLen - 1)) / maxLen,
      s"$idCol * max pieces overflows the order encoding " +
        s"($maxId * $maxLen); re-key the corpus with denser ids")
    val stream = docs
      .select(col(idCol), posexplode(col(piecesCol)).as(Seq("__pos", "__tok")))
      .withColumn("__ord", col(idCol).cast("long") * lit(maxLen) + col("__pos"))
      .withColumn("__s", lit(0))
      .withColumn("__w", lit(1L))
    // ONE bounded collect per sequence; pieces/boundaries/counts all derive
    // from it in the projection. A countDistinct aggregate here would
    // expand into a second full shuffle of the token stream keyed on
    // (seq_id, id) — deriving n_docs from the collected (<= seqLen) rows
    // keeps the plan at exactly two token-stream shuffles (running index,
    // seq assembly; plan-audited in DESIGN).
    Pack.runningTokens(stream, "__s", "__ord", "__w", subStrata)
      .withColumn("seq_id", expr(s"(cum - 1) DIV $seqLen"))
      .withColumn("__off", expr(s"(cum - 1) % $seqLen").cast("int"))
      .groupBy("seq_id")
      .agg(array_sort(collect_list(struct(col("__off"), col("__tok"),
        col("__pos"), col(idCol).cast("long").as("__id")))).as("__rows"))
      .select(col("seq_id"),
        transform(col("__rows"), x => x("__tok")).as("pieces"),
        transform(filter(col("__rows"), x => x("__pos") === 0),
          x => x("__off")).as("doc_starts"),
        size(col("__rows")).cast("long").as("n_tokens"),
        size(array_distinct(transform(col("__rows"), x => x("__id"))))
          .cast("long").as("n_docs"))
  }

  private def emptyResult(docs: DataFrame, piecesCol: String): DataFrame = {
    val elem = docs.schema(piecesCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    docs.sparkSession.range(0).select(
      col("id").as("seq_id"),
      array().cast(org.apache.spark.sql.types.ArrayType(elem)).as("pieces"),
      array().cast("array<int>").as("doc_starts"),
      lit(0L).as("n_tokens"), lit(0L).as("n_docs"))
  }
}
