package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training and application (Schuster &
  * Nakajima 2012; the BERT-family subword model — the third classic
  * vocabulary learner next to [[Bpe]] and [[Unigram]]).
  *
  * WordPiece differs from BPE in exactly two places, and shares everything
  * else (so the scale architecture is [[Bpe]]'s: one corpus scan to a
  * `(word, count)` table, vocab-sized merge rounds, hybrid local/distributed
  * routing, distinct-word encode):
  *
  *   1. '''Merge criterion''': the round winner maximizes the likelihood
  *      ratio `score(a,b) = count(ab) / (count(a) · count(b))` — pair count
  *      normalized by its parts' unit counts — instead of the raw pair
  *      count. The score is computed as ONE IEEE-754 double division of two
  *      exactly-represented integers (pair count, and the `long` product of
  *      the unit counts), so it is bit-identical across engines and across
  *      the local/distributed routes while counts stay below 2^53 — the
  *      same IEEE-exactness argument the repo's α=0.5 temperature gates use.
  *      Past 2^53 (a >petabyte-scale corpus) the double rounds and the
  *      argmax stays deterministic per engine but is no longer provably
  *      cross-engine exact; disclosed rather than guarded because the
  *      rounding direction is still IEEE-defined and identical on any JVM.
  *   2. '''Word-boundary convention''': instead of an end-of-word sentinel,
  *      the first symbol of a word is bare and every later symbol carries
  *      the `##` continuation prefix; fusing `(a, ##b)` yields `a + b`
  *      (the prefix of `a` survives, `b`'s marker is consumed). Decoding is
  *      again a pure string operation: a bare piece opens a new word, a
  *      `##` piece extends the current one. Text whose words themselves
  *      produce symbols that LOOK like continuations (only possible when a
  *      word contains `#`) would decode ambiguously — the exact analogue of
  *      [[Bpe.EndOfWord]]'s in-band-sentinel caveat, inherent to the
  *      convention, and absent from whitespace-tokenized natural text.
  *
  * Encoding is NOT merge replay: WordPiece applies the final vocabulary by
  * greedy longest-match-first (maximal munch) per word, emitting `[UNK]`
  * when some position has no match. Per-word cost is quadratic in word
  * length, bounded by `maxCharsPerWord` (the standard guard — overlong
  * words become `[UNK]` outright) and paid only on the DISTINCT-word table;
  * the corpus-sized pass stays one explode + join, exactly [[Bpe.encode]].
  */
object WordPiece {

  /** Continuation marker prefixed to every non-initial symbol (the BERT
    * convention). See the class scaladoc for the in-band-collision caveat.
    */
  val Continuation = "##"

  /** Emitted for a word that cannot be tiled from the vocabulary (or
    * exceeds `maxCharsPerWord`). Never produced when encoding the training
    * corpus itself — its whole alphabet is in the vocabulary.
    */
  val Unk = "[UNK]"

  /** One learned merge: at `rank`, adjacent symbols `a b` fuse into
    * [[fused]]`(a, b)`; `count` is the winning pair count and `score` the
    * likelihood ratio that won the round.
    */
  final case class Merge(rank: Int, a: String, b: String, count: Long,
                         score: Double)

  /** The fused symbol of pair `(a, b)`: `b` is always a continuation
    * (pairs are adjacent, and every non-initial symbol carries the
    * prefix), so its marker is consumed and `a`'s initial/continuation
    * status survives.
    */
  def fused(a: String, b: String): String = a + b.stripPrefix(Continuation)

  /** Code points of `word`: bare first symbol, `##`-prefixed rest.
    * `substr` is code-point addressed, matching [[codePoints]] — a
    * code-UNIT split would shear supplementary-plane characters into lone
    * surrogates (the [[Bpe.encodeWord]] lesson).
    */
  def baseSymbols(word: Column): Column =
    concat(
      array(word.substr(lit(1), lit(1))),
      when(length(word) >= 2,
        transform(sequence(lit(2), length(word)),
          i => concat(lit(Continuation), word.substr(i, lit(1)))))
      .otherwise(array().cast("array<string>")))

  /** `(syms, cnt)` round-0 table: every distinct word in WordPiece base
    * symbols. One corpus scan ([[Bpe.wordCounts]]); everything after is
    * vocab-sized.
    */
  def initialWords(docs: DataFrame, textCol: String): DataFrame =
    Bpe.wordCounts(docs, textCol)
      .select(baseSymbols(col("word")).as("syms"), col("cnt"))

  /** Frequency-weighted per-symbol unit counts over a `(syms, cnt)` table:
    * `(sym, ucnt)` — the score's denominator parts. One explode + one hash
    * aggregation, symbol-inventory-sized output.
    */
  def unitCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum("cnt").cast("long").as("ucnt"))

  /** Adjacent pairs scored by the WordPiece criterion:
    * `(a, b, cnt, ua, ub, score)` where `score = cnt / (ua·ub)` as one
    * double division (see class scaladoc for the exactness argument). The
    * unit-count side is symbol-inventory-sized, so AQE broadcasts both
    * joins on its own; pair rows never leave the vocab scale.
    *
    * `words` is consumed THREE times (pair counts + the two unit-count
    * join sides) — pass a materialized table (`localCheckpoint`/cache) or
    * each subtree re-derives it from the corpus; [[train]]'s rounds
    * checkpoint theirs for exactly this reason.
    */
  def scoredPairs(words: DataFrame): DataFrame =
    Bpe.pairCounts(words)
      .join(unitCounts(words).select(col("sym").as("a"), col("ucnt").as("ua")),
        Seq("a"))
      .join(unitCounts(words).select(col("sym").as("b"), col("ucnt").as("ub")),
        Seq("b"))
      .select(col("a"), col("b"), col("cnt"), col("ua"), col("ub"),
        (col("cnt").cast("double") / (col("ua") * col("ub")).cast("double"))
          .as("score"))

  /** The greedy left-to-right non-overlapping merge of pair `(a, b)` as a
    * Catalyst fold — [[Bpe.mergePair]] with the WordPiece fusion rule.
    * Non-overlapping by construction: [[fused]] appends `b`'s non-empty
    * tail to `a`, so a fresh fuse can never equal `a` and re-fuse.
    */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused(a, b)))))
        .otherwise(concat(acc, array(x))))

  /** Learn up to `numMerges` merges. Deterministic: pairs under `minCount`
    * are ineligible (filtered BEFORE the argmax, the reference trainers'
    * `min_frequency` semantics), the round winner is the max score with
    * `(a, b)` lexicographic (UTF-8) tie-break, and the loop stops when no
    * eligible pair remains.
    *
    * Hybrid execution, [[Bpe.train]]'s shape verbatim: the one corpus scan
    * builds the distinct-word table distributed; at or under
    * `localVocabLimit` rows the merge rounds run driver-local over the
    * collected table (identical counts, identical IEEE division, identical
    * tie-break — WordPieceSpec pins local == distributed), above it each
    * round is one vocab-sized scored aggregation plus a 1-row argmax
    * collect, with an eager `localCheckpoint` truncating per-round lineage
    * (the plan-string OOM lesson in [[Bpe.train]]'s scaladoc).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L, localVocabLimit: Long = 1L << 20): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges >= 0: $numMerges")
    rounds(initialWords(docs, textCol).localCheckpoint(true),
      numMerges, minCount, localVocabLimit)
  }

  /** Train AND extract the alphabet from ONE word-table build — the entry
    * point for the usual "train a tokenizer, then encode with it" flow,
    * where [[train]] + [[alphabet]] would scan the corpus twice for
    * nothing (the corpus scan dominates everything else at scale; the
    * word table itself is vocab-sized and serves both consumers).
    */
  def model(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L,
            localVocabLimit: Long = 1L << 20): (Seq[String], Seq[Merge]) = {
    require(numMerges >= 0, s"numMerges >= 0: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = initialWords(docs, textCol).localCheckpoint(true)
    val alpha = words.select(explode(col("syms")).as("sym")).distinct()
      .as[String].collect().sorted(graft.util.Utf8Order).toSeq
    (alpha, rounds(words, numMerges, minCount, localVocabLimit))
  }

  /** The merge rounds over a prebuilt round-0 `(syms, cnt)` table (must be
    * checkpointed/materialized by the caller — each distributed round
    * re-checkpoints its successor).
    */
  private def rounds(words0: DataFrame, numMerges: Int, minCount: Long,
                     localVocabLimit: Long): Seq[Merge] = {
    var words = words0
    if (words.count() <= localVocabLimit) {
      val spark = words.sparkSession
      import spark.implicits._
      return trainLocal(
        words.as[(Seq[String], Long)].collect(), numMerges, minCount)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < numMerges && !done) {
      val top = scoredPairs(words).where(col("cnt") >= minCount)
        .orderBy(desc("score"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        // read by NAME — scoredPairs' join keys reorder the output columns
        val row = top(0)
        val (pa, pb) = (row.getAs[String]("a"), row.getAs[String]("b"))
        merges += Merge(merges.length, pa, pb,
          row.getAs[Long]("cnt"), row.getAs[Double]("score"))
        words = words
          .select(mergePair(col("syms"), pa, pb).as("syms"), col("cnt"))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Driver-side merge rounds over the collected vocab table — same
    * counts, same one-division score, same `(−score, a, b)` UTF-8
    * tie-break, same greedy [[fuseSyms]]; exposed for the spec that pins
    * the route equality.
    */
  private[operators] def trainLocal(vocab: Array[(Seq[String], Long)],
                                    numMerges: Int, minCount: Long): Seq[Merge] = {
    var words = vocab.map { case (s, c) => (s.toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < numMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val uc = scala.collection.mutable.HashMap.empty[String, Long]
      for ((syms, cnt) <- words) {
        syms.foreach(s => uc.update(s, uc.getOrElse(s, 0L) + cnt))
        for (i <- 0 until syms.length - 1)
          pc.update((syms(i), syms(i + 1)),
            pc.getOrElse((syms(i), syms(i + 1)), 0L) + cnt)
      }
      val eligible = pc.iterator.filter(_._2 >= minCount).map {
        case ((a, b), c) =>
          // long multiply then ONE double division — bit-for-bit the
          // distributed plan's (cnt DOUBLE) / ((ua * ub) DOUBLE)
          (a, b, c, c.toDouble / (uc(a) * uc(b)).toDouble)
      }.toSeq
      if (eligible.isEmpty) done = true
      else {
        val (a, b, c, s) = eligible.minBy { case (a2, b2, _, s2) => (-s2, a2, b2) }(
          Ordering.Tuple3(Ordering.Double.TotalOrdering, graft.util.Utf8Order,
            graft.util.Utf8Order))
        merges += Merge(merges.length, a, b, c, s)
        words = words.map { case (syms, cnt) => (fuseSyms(syms, a, b), cnt) }
      }
    }
    merges.toSeq
  }

  /** One greedy merge pass — the imperative twin of [[mergePair]]. */
  private def fuseSyms(syms: Vector[String], a: String, b: String): Vector[String] =
    if (syms.length < 2) syms
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b)
          out(out.length - 1) = fused(a, b)
        else out += x
      }
      out.toVector
    }

  /** The training corpus's base-symbol inventory, UTF-8-sorted — the
    * vocabulary floor that makes every training-corpus word tileable (and
    * self-encode `[UNK]`-free). Symbol-inventory-sized; collected because
    * it broadcasts into [[encode]] alongside the merges.
    */
  def alphabet(docs: DataFrame, textCol: String): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    initialWords(docs, textCol)
      .select(explode(col("syms")).as("sym")).distinct()
      .as[String].collect().sorted(graft.util.Utf8Order)
  }

  /** The applied vocabulary: alphabet ∪ fused merge symbols. */
  def vocabulary(alpha: Seq[String], merges: Seq[Merge]): Set[String] =
    alpha.toSet ++ merges.iterator.map(m => fused(m.a, m.b))

  /** Greedy longest-match-first segmentation of one word (maximal munch —
    * the WordPiece APPLY algorithm; merge order is training-only state).
    * Code-point addressed; a word over `maxCharsPerWord` code points or
    * with an untileable position becomes `[[Unk]]` whole, the standard
    * semantics.
    */
  def encodeWord(word: String, vocab: Set[String],
                 maxCharsPerWord: Int = 100): Seq[String] = {
    val cps = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    if (cps.isEmpty) return Seq.empty
    if (cps.length > maxCharsPerWord) return Seq(Unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < cps.length) {
      var end = cps.length
      var hit: String = null
      while (end > pos && hit == null) {
        val sub = cps.slice(pos, end).mkString
        val cand = if (pos > 0) Continuation + sub else sub
        if (vocab(cand)) hit = cand else end -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit
      pos = end
    }
    out.toSeq
  }

  /** Tokenize the corpus: `(idCol, pieces)` in token order. [[Bpe.encode]]'s
    * distinct-word architecture verbatim — maximal munch runs once per
    * DISTINCT word (imperative per word on purpose: the match loop is not
    * expressible as a bounded-depth column tree), the corpus-sized pass is
    * one posexplode + word join + per-doc reassembly; docs with no tokens
    * get an empty piece array. The vocab side is not hint-broadcast for
    * [[Bpe.encode]]'s reason: AQE broadcasts the usual case on its own and
    * a 10^8-distinct-word corpus must shuffle-join.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             alpha: Seq[String], merges: Seq[Merge],
             maxCharsPerWord: Int = 100): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = vocabulary(alpha, merges)
    val encoded = docs
      .select(explode(tokens(col(textCol))).as("word")).distinct()
      .as[String]
      .map(w => (w, encodeWord(w, vocab, maxCharsPerWord)))
      .toDF("word", "pieces")
    val assembled = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__pos", "word")))
      .join(encoded, Seq("word"))
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("pieces")))),
        x => x("pieces"))).as("pieces"))
    docs.select(col(idCol))
      .join(assembled, Seq(idCol), "left")
      .withColumn("pieces",
        coalesce(col("pieces"), array().cast("array<string>")))
  }

  /** Reconstruct normalized text (lowercased, single-spaced) from a piece
    * stream: a bare piece opens a word, a `##` piece extends it. Exact on
    * any `[UNK]`-free self-encode of `#`-free text (class scaladoc).
    */
  def decode(pieces: Column): Column =
    ltrim(aggregate(pieces, lit(""),
      (acc, p) =>
        when(substring(p, 1, 2) === lit(Continuation),
          concat(acc, p.substr(lit(3), length(p) - 2)))
        .otherwise(concat(acc, lit(" "), p))))

  /** Persist a trained tokenizer: alphabet rows at `rank = -1` (piece =
    * symbol) plus one row per merge in rank order. Tiny by design — the
    * artifact broadcasts into [[encode]]; version through
    * [[graft.pipeline.IndexVersions]] like every other sealed model store.
    */
  def write(alpha: Seq[String], merges: Seq[Merge], path: String,
            spark: SparkSession): Unit = {
    import spark.implicits._
    val alphaRows = alpha.map(s => (-1, null: String, null: String,
      0L, 0.0, s))
    val mergeRows = merges.map(m => (m.rank, m.a, m.b, m.count, m.score,
      fused(m.a, m.b)))
    (alphaRows ++ mergeRows)
      .toDF("rank", "a", "b", "count", "score", "piece")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reopen a persisted tokenizer: `(alphabet, merges)`, merges in rank
    * order. Parquet round-trips the longs and doubles exactly, so the
    * stored model answers bit-identically to the trained one.
    */
  def open(spark: SparkSession, path: String): (Seq[String], Seq[Merge]) = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("rank", "a", "b", "count", "score", "piece")
      .as[(Int, String, String, Long, Double, String)].collect()
    val alpha = rows.filter(_._1 == -1).map(_._6)
      .sorted(graft.util.Utf8Order).toSeq
    val merges = rows.filter(_._1 >= 0).sortBy(_._1)
      .map { case (r, a, b, c, s, _) => Merge(r, a, b, c, s) }.toSeq
    (alpha, merges)
  }
}
