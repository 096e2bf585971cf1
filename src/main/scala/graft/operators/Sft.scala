package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / instruction-tuning data prep: render multi-turn conversations
  * through a chat template and emit the CHARACTER spans of the turns that
  * should receive loss (the assistant turns) — the standard
  * "mask everything except assistant content" contract of instruction
  * tuning, produced at the data layer so any tokenizer downstream can map
  * char spans to token masks (offset mapping), instead of baking one
  * tokenizer's ids into the corpus.
  *
  * Rendered text per conversation = concat over turns in `idxCol` order of
  * `tag(role) + content + turnSep`; a mask span covers exactly the CONTENT
  * of each `maskRole` turn (tags and separators stay unmasked — they are
  * prompt structure, not supervision).
  *
  * Scale shape: one hash exchange on the conversation key does everything —
  * the per-turn start offsets are a window cumulative sum over that
  * partitioning, and the final assembly is a groupBy on the same key
  * (exchange reused), with the pieces ordered by a plain `array_sort` on
  * `(idx, piece)` structs. All string work is codegen'd built-ins; no UDFs,
  * no per-conversation tasks.
  */
object Sft {

  /** Context-fit truncation: keep the SUFFIX of each conversation whose
    * rendered length (tag + content + separator per turn) fits `maxChars` —
    * the standard "drop the oldest turns" rule for examples longer than the
    * training context. Returns the input rows that survive, same schema —
    * compose with [[render]]. A conversation whose newest turn alone
    * exceeds the budget disappears entirely (it cannot fit; count the
    * output's distinct keys against the input's to observe the drops).
    * Character budgets are the portable seam (same argument as [[render]]'s
    * char spans): map chars → tokens downstream via the tokenizer's offsets.
    *
    * `idxCol` must be UNIQUE within a conversation — the same contract as
    * [[render]], which this composes with: the suffix sum uses the default
    * RANGE window frame, so tied indices would receive identical cumulative
    * sums and the kept suffix would be ill-defined (both tied turns kept or
    * both dropped, regardless of which one actually fits).
    *
    * Cost: one window (sum of piece lengths from the conversation's END)
    * on the same conversation-key exchange [[render]] uses next.
    */
  def truncateToBudget(turns: DataFrame, convCol: String, idxCol: String,
                       roleCol: String, contentCol: String, maxChars: Long,
                       roleTags: Seq[(String, String)] =
                         Seq("user" -> "<|user|>\n", "assistant" -> "<|assistant|>\n"),
                       turnSep: String = "\n"): DataFrame = {
    require(maxChars > 0, s"maxChars > 0: $maxChars")
    val tag = tagFor(turns, convCol, roleCol, roleTags)
    // code-point count, matching Spark's length() on the columns (a
    // String.length of an astral-char separator counts UTF-16 units)
    val pieceLen = (length(tag) + length(contentOf(convCol, contentCol)) +
      lit(turnSep.codePointCount(0, turnSep.length))).cast("long")
    val wDesc = Window.partitionBy(convCol)
      .orderBy(col(idxCol).desc)
    turns
      .withColumn("__sfx", sum(pieceLen).over(wDesc))
      .where(col("__sfx") <= maxChars)
      .drop("__sfx")
  }

  /** Preference-pair selection for DPO/RLHF prep: per prompt, `chosen` =
    * the highest-scored candidate and `rejected` = the lowest-scored, with
    * fully deterministic tie-breaks — candidates order by
    * `(score desc, candidate id asc)` and the pair is (first, last) of
    * that order, so two equal-scored candidates still yield a stable,
    * distinct pair. Prompts with fewer than two candidates emit nothing
    * (no pair exists). `candCol` must be unique within a prompt (it is the
    * tie-break). Output: `(<promptCol>, chosen, chosen_score, rejected,
    * rejected_score, n_cands)`.
    *
    * Null scores are EXCLUDED before pairing (and `n_cands` counts only
    * scored candidates): an unscored candidate carries no preference
    * signal, and without the filter Spark's struct ordering would sort the
    * null ordering field first — deterministically crowning an unscored
    * candidate as `chosen`, a silently corrupted pair.
    *
    * `minMargin` (default 0 = keep everything) drops pairs whose
    * `chosen_score − rejected_score` falls BELOW it — the conventional
    * DPO-prep hygiene step: a near-tie pair is label noise (the preference
    * signal is within rater/scorer error), and training on it teaches the
    * margin model that noise. Applied AFTER pairing, so a prompt whose
    * best and worst candidates are close emits nothing rather than
    * reaching deeper into the candidate list for a wider-but-weaker pair.
    * The boundary is inclusive (`margin >= minMargin` keeps) so an
    * integer-scored corpus can gate exactly at a score atom.
    *
    * Scale shape: ONE hash aggregation — min_by/max_by over a composite
    * ordering struct, no window, no sort, no self-join; the margin filter
    * is a scalar predicate on the prompts-sized output.
    */
  def preferencePairs(cands: DataFrame, promptCol: String, candCol: String,
                      scoreCol: String, minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0.0, s"minMargin >= 0: $minMargin")
    val scored = cands.where(col(scoreCol).isNotNull)
    // null candidate id = structural corruption, not missing data: it
    // sorts FIRST in the tie-break (null-first struct ordering), wins
    // every tie, and the pair ships with chosen = null — raise instead
    // (a null SCORE is expected missingness and is excluded above)
    val ord = struct((-col(scoreCol)).as("ns"),
      candGuard(promptCol, candCol).as("c"))
    val v = struct(col(candCol).as("cand"), col(scoreCol).as("score"))
    val pairs = scored.groupBy(promptCol)
      .agg(count(lit(1)).as("n_cands"),
        min_by(v, ord).as("__ch"), max_by(v, ord).as("__rj"))
      .where(col("n_cands") >= 2)
      .select(col(promptCol),
        col("__ch.cand").as("chosen"), col("__ch.score").as("chosen_score"),
        col("__rj.cand").as("rejected"), col("__rj.score").as("rejected_score"),
        col("n_cands"))
    if (minMargin == 0.0) pairs
    else pairs.where(
      col("chosen_score") - col("rejected_score") >= lit(minMargin))
  }

  /** Rejection-sampling selection (best-of-N): keep each prompt's top `k`
    * candidates by `(score desc, candId asc)` — rank 1 is the greedy
    * winner, rank ≤ k the RFT/rejection-sampling keep set. Same
    * deterministic tie-break and null-score exclusion contract as
    * [[preferencePairs]] (`candCol` unique within a prompt; unscored
    * candidates carry no signal and are dropped before ranking). Output =
    * the surviving input rows plus a 1-based `rank`.
    *
    * Scale shape: ONE hash exchange on the prompt key + per-partition
    * sort (window row_number) — no global sort, no self-join; prompts are
    * many and candidate lists short, so the window never concentrates.
    */
  def bestOfN(cands: DataFrame, promptCol: String, candCol: String,
              scoreCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    // the output owns `rank`; silently overwriting a caller's prior
    // ranking would destroy data (the Chunk/Pii owned-column contract)
    require(!cands.columns.contains("rank"),
      "bestOfN owns the output column 'rank'; rename the input's rank first")
    val w = Window.partitionBy(promptCol)
      .orderBy(col(scoreCol).desc, candGuard(promptCol, candCol).asc)
    cands.where(col(scoreCol).isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Null-candidate-id guard shared by [[preferencePairs]] and
    * [[bestOfN]] — see the pairing scaladoc; the [[contentOf]]
    * discipline applied to the tie-break column.
    */
  private def candGuard(promptCol: String, candCol: String) =
    when(col(candCol).isNull, raise_error(concat(
      lit(s"null $candCol for $promptCol="), col(promptCol).cast("string"))))
      .otherwise(col(candCol))

  /** Null-content guard shared by [[render]] and [[truncateToBudget]]:
    * a null turn would otherwise corrupt SILENTLY — concat nulls its
    * piece, the null piece drops out of the assembled text, but the
    * turn's mask span still emits with null offsets. Loud failure, the
    * [[tagFor]] unknown-role discipline.
    */
  private def contentOf(convCol: String, contentCol: String) =
    when(col(contentCol).isNull, raise_error(concat(
      lit(s"null $contentCol for $convCol="), col(convCol).cast("string"))))
      .otherwise(col(contentCol))

  /** Role → tag dispatch shared by [[render]] and [[truncateToBudget]];
    * unknown roles fail loudly (a silently dropped system turn is a
    * corrupted training example).
    */
  private def tagFor(turns: DataFrame, convCol: String, roleCol: String,
                     roleTags: Seq[(String, String)]) = {
    require(roleTags.nonEmpty, "roleTags must not be empty")
    roleTags.tail.foldLeft(
        when(col(roleCol) === roleTags.head._1, lit(roleTags.head._2))) {
        case (acc, (r, t)) => acc.when(col(roleCol) === r, lit(t))
      }
      .otherwise(raise_error(concat(
        lit(s"unknown role for $convCol="), col(convCol).cast("string"),
        lit(": "), col(roleCol))))
  }

  /** `idxCol` must be UNIQUE within a conversation: the start offsets are a
    * running sum ordered by it, and tied indices would make both the piece
    * order and the tied rows' offsets ill-defined (Spark's RANGE window
    * frame gives tied rows the same cumulative sum).
    *
    * Memory bound: each conversation's full rendered text is assembled in
    * ONE aggregation buffer row (a collect_list of its pieces), so the
    * bound is the largest single conversation, not the corpus — fine for
    * chat data (KB-scale conversations), but a degenerate million-turn
    * conversation lands one giant row on an executor. Compose with
    * [[truncateToBudget]] first when the input is not trusted to be
    * conversation-sized; the budget then bounds the buffer explicitly.
    *
    * @param roleTags   (role → tag) pairs; a turn's rendered form is
    *                   `tag + content + turnSep`. Roles absent from the
    *                   map fail loudly (a silently dropped system turn is
    *                   a corrupted training example).
    * @param maskRole   role whose CONTENT character ranges are returned as
    *                   `spans: array<struct<span_start, span_end>>`
    *                   (0-based, end-exclusive), ordered by position.
    * @return one row per conversation: `(<convCol>, text, spans)`.
    */
  def render(turns: DataFrame, convCol: String, idxCol: String,
             roleCol: String, contentCol: String,
             roleTags: Seq[(String, String)] =
               Seq("user" -> "<|user|>\n", "assistant" -> "<|assistant|>\n"),
             maskRole: String = "assistant",
             turnSep: String = "\n"): DataFrame = {
    require(roleTags.exists(_._1 == maskRole),
      s"maskRole '$maskRole' has no tag in roleTags")
    val tag = tagFor(turns, convCol, roleCol, roleTags)
    val piece = concat(tag, contentOf(convCol, contentCol), lit(turnSep))
    val w = Window.partitionBy(convCol).orderBy(idxCol)
    val laid = turns
      .withColumn("__piece", piece)
      .withColumn("__start",
        coalesce(sum(length(col("__piece")).cast("long")).over(w), lit(0L)) -
          length(col("__piece")).cast("long"))
      .withColumn("__s", col("__start") + length(tag).cast("long"))
      .withColumn("__e", col("__s") + length(col(contentCol)).cast("long"))
    laid.groupBy(convCol)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col(idxCol).as("i"),
            col("__piece").as("p")))), x => x("p")), "").as("text"),
        array_sort(collect_list(
          when(col(roleCol) === maskRole,
            struct(col("__s").as("span_start"), col("__e").as("span_end")))))
          .as("spans"))
  }
}
