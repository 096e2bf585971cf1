package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training and application (Kudo 2018,
  * "Subword Regularization" — the SentencePiece unigram model used by
  * T5/ALBERT/XLNet; the OTHER major subword family next to [[Bpe]]).
  *
  * The model is a piece inventory with log-probabilities; a word's
  * tokenization is its max-likelihood segmentation (Viterbi over the
  * lattice of matching pieces). Training is Viterbi-EM over substring
  * candidates: seed the vocab with the corpus's most frequent substrings,
  * alternate segment-under-current-probs (E) with re-estimate-from-
  * segment-counts (M), then PRUNE toward the target size keeping every
  * single character (so any word stays segmentable and the roundtrip is
  * exact by construction).
  *
  * Scale architecture is [[Bpe]]'s exactly: ONE corpus scan builds the
  * `(word, cnt)` table, and every later stage — seeding, each EM round,
  * pruning, encoding — is VOCAB-sized, frequency-weighted work that never
  * touches corpus text again. E-steps segment DISTINCT words imperatively
  * with the piece table broadcast (the piece inventory is model-sized:
  * 10^4-10^5 entries); M-steps are one distributed aggregation over
  * exploded piece counts. The same hybrid routing applies: a vocab that
  * fits the driver (`localVocabLimit`) trains entirely locally with
  * bit-identical results (UnigramSpec pins local == distributed), so
  * gate-scale training skips per-round job overhead; a 10^8-distinct-word
  * corpus takes the distributed rounds.
  *
  * Determinism: every argmax/prune orders by `(-score, piece)`; Viterbi
  * ties prefer the LONGER final piece (then the shorter total
  * segmentation by induction). Double arithmetic follows one shared code
  * path ([[viterbi]]) on both routes, so local and distributed
  * segmentations can never diverge.
  */
object Unigram {

  /** One inventory entry: `piece` with its natural-log probability. */
  final case class Piece(piece: String, logProb: Double)

  /** Floor log-prob for characters absent from the inventory (unseen at
    * train time): harshly penalized so known pieces always win, but still
    * segmentable — the roundtrip stays exact on ANY input text.
    */
  val UnkLogProb: Double = -1e4

  /** Upper bound on seed/inventory piece length — SentencePiece's
    * max_sentencepiece_length convention.
    */
  val MaxPieceLen = 8

  /** `(word, cnt)` — the one corpus scan (shared shape with
    * [[Bpe.wordCounts]]).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  // ---------------------------------------------------------------------
  // Shared model math (one code path for local and distributed routes)
  // ---------------------------------------------------------------------

  /** Code-point symbols of `word` — the unit of substring enumeration,
    * piece length, and Viterbi lattice positions. Code UNITS would emit
    * lone-surrogate pieces, which cannot round-trip through Spark's UTF-8
    * string storage: the distributed route would silently fold both
    * halves of every supplementary-plane character (emoji, rare CJK)
    * into one replacement char and the routes would diverge. Same
    * convention as [[Bpe.baseSymbols]]/[[Bpe.encodeWord]].
    */
  private def cpSyms(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** A "single character" for inventory purposes = one code point. */
  private def isSingleCp(p: String): Boolean =
    p.nonEmpty && p.codePointCount(0, p.length) == 1

  /** All substrings of `word` up to [[MaxPieceLen]] code points (with
    * multiplicity — seeding weights a substring by how often it occurs).
    */
  private def substrings(word: String): Seq[String] = {
    val cps = cpSyms(word)
    for {
      i <- 0 until cps.length
      l <- 1 to math.min(MaxPieceLen, cps.length - i)
    } yield cps.slice(i, i + l).mkString
  }

  /** Max-likelihood segmentation of `word` under `logP` — lattice Viterbi
    * over code-point positions: `best(i)` = best score of the first `i`
    * code points; at each end position try every piece length
    * longest-first, so an exact score tie keeps the LONGER final piece
    * (the deterministic tie-break).
    */
  def viterbi(word: String, logP: collection.Map[String, Double]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val cps = cpSyms(word)
    val n = cps.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(0)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = math.min(MaxPieceLen, i)
      while (l >= 1) {
        val start = i - l
        if (best(start) > Double.NegativeInfinity) {
          val piece =
            if (l == 1) cps(start) else cps.slice(start, i).mkString
          val lp =
            if (l == 1) logP.getOrElse(piece, UnkLogProb)
            else logP.getOrElse(piece, Double.NegativeInfinity)
          if (lp > Double.NegativeInfinity) {
            val s = best(start) + lp
            // strict > : the first (longest) candidate wins exact ties
            if (s > best(i)) { best(i) = s; back(i) = l }
          }
        }
        l -= 1
      }
      i += 1
    }
    // single-char fallback guarantees reachability for every position
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = n
    while (p > 0) { rev += back(p); p -= back(p) }
    var idx = 0
    var pos = 0
    val lens = rev.reverse
    while (idx < lens.length) {
      out += (if (lens(idx) == 1) cps(pos)
        else cps.slice(pos, pos + lens(idx)).mkString)
      pos += lens(idx); idx += 1
    }
    out.result()
  }

  /** Normalize raw weighted counts into log-probs; deterministic iteration
    * (sorted by piece) so floating sums are order-stable everywhere.
    */
  private def normalize(counts: Seq[(String, Double)]): Seq[Piece] = {
    val sorted = counts.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    sorted.map { case (p, c) => Piece(p, math.log(c) - math.log(total)) }
  }

  /** Seed inventory from a `(word, cnt)` table (already collected or as
    * one distributed aggregation): substring frequencies weighted by word
    * count, top `maxSeedSize` by `(-freq, piece)`, plus EVERY single
    * character unconditionally.
    */
  private def seedLocal(wc: Seq[(String, Long)], maxSeedSize: Int): Seq[Piece] = {
    val freq = scala.collection.mutable.HashMap.empty[String, Double]
    for ((w, c) <- wc; s <- substrings(w))
      freq.update(s, freq.getOrElse(s, 0.0) + c.toDouble)
    val (chars, multi) = freq.toSeq.partition(p => isSingleCp(p._1))
    // UTF-8 byte order on the piece tie, matching seedDist's
    // orderBy(asc("piece")) binary collation
    val kept = multi.sortBy { case (p, f) => (-f, p) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, graft.util.Utf8Order))
      .take(math.max(maxSeedSize - chars.size, 0))
    normalize(chars ++ kept)
  }

  /** One Viterbi-EM round over a collected vocab: segment every distinct
    * word under the current probs, re-estimate piece probs from the
    * weighted segment counts. Pieces that win no segment fall out of the
    * inventory — except single chars, which are floored at a pseudo-count
    * of 0.5 so segmentability never regresses.
    */
  private def emLocal(wc: Seq[(String, Long)], pieces: Seq[Piece]): Seq[Piece] = {
    val logP = pieces.map(p => p.piece -> p.logProb).toMap
    val counts = scala.collection.mutable.HashMap.empty[String, Double]
    for ((w, c) <- wc; p <- viterbi(w, logP))
      counts.update(p, counts.getOrElse(p, 0.0) + c.toDouble)
    val chars = pieces.iterator.map(_.piece).filter(isSingleCp)
    for (ch <- chars if !counts.contains(ch)) counts.update(ch, 0.5)
    normalize(counts.toSeq)
  }

  /** Prune to `vocabSize` keeping all single chars: drop the lowest-prob
    * multi-char pieces first (`(-logProb, piece)` order), then renormalize.
    */
  private def pruneLocal(pieces: Seq[Piece], vocabSize: Int): Seq[Piece] = {
    val (chars, multi) = pieces.partition(p => isSingleCp(p.piece))
    val kept = multi.sortBy(p => (-p.logProb, p.piece))
      .take(math.max(vocabSize - chars.size, 0))
    normalize((chars ++ kept).map(p => p.piece -> math.exp(p.logProb)))
  }

  // ---------------------------------------------------------------------
  // Training
  // ---------------------------------------------------------------------

  /** Train a unigram inventory of (at most) `vocabSize` pieces: seed with
    * `seedFactor * vocabSize` candidate substrings, run `emRounds` rounds
    * of Viterbi-EM, prune to target, and one final EM round so the
    * returned probs reflect the pruned inventory.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            emRounds: Int = 2, seedFactor: Int = 4,
            localVocabLimit: Long = 1L << 20): Seq[Piece] = {
    require(vocabSize > 0, s"vocabSize > 0: $vocabSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val wcDf = wordCounts(docs, textCol).localCheckpoint(true)
    if (wcDf.count() <= localVocabLimit) {
      val wc = wcDf.as[(String, Long)].collect().toSeq
      var pieces = seedLocal(wc, seedFactor * vocabSize)
      for (_ <- 0 until emRounds) pieces = emLocal(wc, pieces)
      pieces = pruneLocal(pieces, vocabSize)
      emLocal(wc, pieces)
    } else {
      // distributed route: same stages, vocab-sized frames. Seeding is one
      // explode + aggregation; each E-step is a Dataset.map over distinct
      // words with the piece table broadcast (model-sized by construction
      // after seeding's top-K cut); each M-step one aggregation.
      var pieces = seedDist(wcDf, seedFactor * vocabSize)
      for (_ <- 0 until emRounds) pieces = emDist(wcDf, pieces)
      pieces = pruneLocal(pieces, vocabSize)
      emDist(wcDf, pieces)
    }
  }

  private def seedDist(wcDf: DataFrame, maxSeedSize: Int): Seq[Piece] = {
    val spark = wcDf.sparkSession
    import spark.implicits._
    // the single-char flag is computed on the ENUMERATION side with the
    // same isSingleCp rule seedLocal uses — Spark's length() also counts
    // code points, but carrying the flag keeps the classification
    // decision in exactly one place for both routes
    val freq = wcDf.as[(String, Long)]
      .flatMap { case (w, c) =>
        substrings(w).map(s => (s, c.toDouble, isSingleCp(s))) }
      .toDF("piece", "f", "single")
      .groupBy("piece").agg(sum("f").as("f"), first("single").as("single"))
    val chars = freq.where(col("single"))
      .select("piece", "f").as[(String, Double)].collect()
    val multi = freq.where(!col("single"))
      .orderBy(desc("f"), asc("piece"))
      .limit(math.max(maxSeedSize - chars.length, 0))
      .select("piece", "f").as[(String, Double)].collect()
    normalize((chars ++ multi).toSeq)
  }

  private def emDist(wcDf: DataFrame, pieces: Seq[Piece]): Seq[Piece] = {
    val spark = wcDf.sparkSession
    import spark.implicits._
    val logP = pieces.map(p => p.piece -> p.logProb).toMap
    val counts = wcDf.as[(String, Long)]
      .flatMap { case (w, c) => viterbi(w, logP).map(_ -> c.toDouble) }
      .toDF("piece", "f")
      .groupBy("piece").agg(sum("f").as("f"))
      .as[(String, Double)].collect()
    val have = counts.map(_._1).toSet
    val floor = pieces.iterator.map(_.piece)
      .filter(p => isSingleCp(p) && !have.contains(p)).map(_ -> 0.5)
    normalize(counts.toSeq ++ floor)
  }

  // ---------------------------------------------------------------------
  // Persistence (the [[Bpe.write]]/[[Bpe.open]] conventions; compose with
  // [[graft.pipeline.IndexVersions]] for sealed publishes)
  // ---------------------------------------------------------------------

  def write(pieces: Seq[Piece], path: String,
            spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "log_prob")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def open(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Piece] = {
    import spark.implicits._
    spark.read.parquet(path).select("piece", "log_prob")
      .orderBy("piece").as[(String, Double)].collect()
      .map { case (p, lp) => Piece(p, lp) }.toSeq
  }

  // ---------------------------------------------------------------------
  // Application
  // ---------------------------------------------------------------------

  /** Tokenize the corpus: `(idCol, pieces)` in token order — the same
    * distinct-words + broadcast-or-shuffle join shape as [[Bpe.encode]]
    * (and the same deliberate no-broadcast-hint reasoning there).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             pieces: Seq[Piece]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val logP = pieces.map(p => p.piece -> p.logProb).toMap
    val vocab = docs.select(explode(tokens(col(textCol))).as("word")).distinct()
      .as[String].map(w => (w, viterbi(w, logP))).toDF("word", "pieces")
    val assembled = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__pos", "word")))
      .join(vocab, Seq("word"))
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("pieces")))),
        x => x("pieces"))).as("pieces"))
    docs.select(col(idCol))
      .join(assembled, Seq(idCol), "left")
      .withColumn("pieces",
        coalesce(col("pieces"), array().cast("array<string>")))
  }

  /** Unigram pieces carry no end-of-word sentinel (unlike [[Bpe]]), so
    * whole-document decode needs the per-word piece COUNTS alongside the
    * stream; the roundtrip identity lives at the word level — the concat
    * of one word's pieces is the word, exactly, by construction (Viterbi
    * segmentations tile the word). [[decodeJoined]] restates it as a
    * column: re-joining each word's segmentation with spaces reproduces
    * `concat_ws(" ", tokens(text))`.
    */
  def decodeWord(pieces: Seq[String]): String = pieces.mkString

  /** `(idCol, text)` reconstruction through the per-word path: segment
    * every distinct word, re-join pieces per word, re-join words per doc —
    * equals the normalized text whenever the roundtrip identity holds.
    */
  def decodeJoined(docs: DataFrame, idCol: String, textCol: String,
                   pieces: Seq[Piece]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val logP = pieces.map(p => p.piece -> p.logProb).toMap
    val vocab = docs.select(explode(tokens(col(textCol))).as("word")).distinct()
      .as[String].map(w => (w, viterbi(w, logP).mkString)).toDF("word", "rejoined")
    docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__pos", "word")))
      .join(vocab, Seq("word"))
      .groupBy(idCol)
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("__pos"), col("rejoined")))),
        x => x("rejoined"))).as(textCol))
  }
}
