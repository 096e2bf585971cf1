package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training and application
  * (Sennrich et al. 2016; the subword vocabulary step every LLM pretraining
  * pipeline runs before packing).
  *
  * The scale architecture is the one real tokenizer trainers use: the corpus
  * is scanned ONCE to build a `(word, count)` table, and every subsequent
  * merge round runs over that VOCAB-sized table — pair statistics are
  * word-frequency-weighted, so the corpus text never participates again.
  * Each round is one distributed aggregation (adjacent-pair counts, map-side
  * partials) plus a 1-row argmax collect — the driver sync point IS the
  * algorithm (a merge decision is a global argmax), exactly [[Lloyd]]'s
  * per-iteration shape.
  *
  * Merging applies the chosen pair left-to-right, non-overlapping — the
  * standard greedy pass — expressed as a single `aggregate` fold over the
  * symbol array (codegen-friendly, no UDF): pop the accumulator's last
  * element when it is `a` and the incoming symbol is `b`.
  *
  * Encoding replays the merge list per DISTINCT word (vocab-sized work,
  * imperative per word — the [[encodeWords]] scaladoc explains why), then
  * the corpus encodes via a broadcast join on the word — the same
  * distinct-words trick, so corpus cost is one explode + broadcast join
  * however long the merge list is.
  */
object Bpe {

  /** End-of-word sentinel appended to every word's symbol sequence (the
    * Sennrich convention — lets a trailing subword differ from the same
    * subword mid-word, and makes decoding a pure string operation).
    * Documents whose TEXT contains this literal string would decode
    * ambiguously; no whitespace tokenizer output does in practice.
    */
  val EndOfWord = "</w>"

  /** One learned merge: at `rank`, adjacent symbols `a b` fuse into `a+b`;
    * `count` is the frequency-weighted pair count that won the round.
    */
  final case class Merge(rank: Int, a: String, b: String, count: Long)

  /** `(word, cnt)` — the one corpus scan. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Characters of `word` plus the [[EndOfWord]] sentinel. */
  def baseSymbols(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit(EndOfWord)))

  /** `(syms, cnt)` round-0 table: every distinct word as characters. */
  def initialWords(docs: DataFrame, textCol: String): DataFrame =
    wordCounts(docs, textCol)
      .select(baseSymbols(col("word")).as("syms"), col("cnt"))

  /** Frequency-weighted adjacent-pair counts over a `(syms, cnt)` table:
    * `(a, b, cnt)`. One explode + one hash aggregation.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"),
        explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").cast("long").as("cnt"))

  /** The greedy left-to-right merge of pair `(a, b)` as a Catalyst fold:
    * append each symbol, but when the accumulator ends in `a` and the
    * incoming symbol is `b`, replace that tail with `a+b`. Non-overlapping
    * by construction: the fused symbol `a+b` can never equal `a` (`b` is
    * non-empty), so a fresh fuse is never itself the left side of another.
    */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn up to `numMerges` merges. Deterministic: the round winner is the
    * max weighted count with `(a, b)` lexicographic tie-break; stops early
    * when the best remaining pair falls under `minCount`.
    *
    * Hybrid execution — the shape real tokenizer trainers use: the one
    * corpus scan builds the distinct-word table distributed, and then IF
    * that table fits comfortably on the driver (`localVocabLimit` rows) the
    * merge rounds run LOCALLY over the collected `(syms, cnt)` array —
    * identical argmax / `(a, b)` tie-break / greedy fold ([[trainLocal]]
    * shares [[fuse]] with [[encodeWord]], and BpeSpec pins
    * local == distributed), so the result is bit-identical while each
    * round costs microseconds instead of a full job round-trip (~40
    * sequential jobs of pure scheduler overhead at gate scale). The vocab
    * row count never changes across rounds (symbols merge WITHIN words),
    * so the route is decided once, after the only corpus-sized stage.
    *
    * Above the limit (a web-scale corpus's distinct-word table can run to
    * 10^8 rows) the rounds stay distributed: each is one vocab-sized
    * aggregation (adjacent-pair counts, map-side partials) plus a 1-row
    * argmax collect. Each distributed round re-materializes the vocab
    * table with an eager `localCheckpoint`, TRUNCATING lineage — without
    * it every round's plan nests the previous round's merge fold and
    * per-round planning cost compounds until the driver dies on plan
    * strings alone (observed: OOM in `explainString` at 20 rounds over a
    * real vocab). Superseded checkpoint blocks are released by the
    * ContextCleaner once the previous round's DataFrame is unreachable.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L, localVocabLimit: Long = 1L << 20): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges >= 0: $numMerges")
    rounds(initialWords(docs, textCol).localCheckpoint(true),
      numMerges, minCount, localVocabLimit, rankOffset = 0)
  }

  /** Continue training an existing merge list with up to `numMore` new
    * merges over `docs` — the vocab-EXTENSION half of the merge-table
    * lifecycle (retraining from scratch is the other; a tokenizer version
    * is immutable once a model trained against it, so extension publishes
    * a NEW sealed version via [[graft.pipeline.IndexVersions]], never an
    * in-place mutation).
    *
    * Prefix-stability theorem (BpeSpec pins it): greedy BPE's state after
    * `k` merges is fully determined by those merges — re-segmenting the
    * vocab through `prior` reproduces the words table training had after
    * round `k` exactly, so `extend(docs, train(docs, k), m) ==
    * train(docs, k + m)` whenever `prior` came from the same corpus. The
    * re-segmentation is ONE vocab-sized pass ([[encodeWords]] replays the
    * whole list per distinct word), not `k` sequential rounds.
    */
  def extend(docs: DataFrame, textCol: String, prior: Seq[Merge], numMore: Int,
             minCount: Long = 2L, localVocabLimit: Long = 1L << 20): Seq[Merge] = {
    require(numMore >= 0, s"numMore >= 0: $numMore")
    require(prior.map(_.rank) == prior.indices,
      s"prior merges must be rank-ordered 0..${prior.length - 1}")
    val wc = wordCounts(docs, textCol)
    val words = encodeWords(wc.select("word"), prior)
      .join(wc, Seq("word"))
      .select(col("pieces").as("syms"), col("cnt"))
      .localCheckpoint(true)
    prior ++ rounds(words, numMore, minCount, localVocabLimit,
      rankOffset = prior.length)
  }

  /** Route the merge rounds local or distributed (see [[train]] scaladoc);
    * `rankOffset` numbers the learned merges for the extension path.
    */
  private def rounds(words0: DataFrame, numMerges: Int, minCount: Long,
                     localVocabLimit: Long, rankOffset: Int): Seq[Merge] = {
    var words = words0
    if (words.count() <= localVocabLimit) {
      val spark = words.sparkSession
      import spark.implicits._
      return trainLocal(
        words.as[(Seq[String], Long)].collect(), numMerges, minCount, rankOffset)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rankOffset + merges.length, a, b, c)
        words = words
          .select(mergePair(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** The driver-side merge rounds over a collected vocab table — same
    * argmax (max weighted count, `(a, b)` lexicographic tie-break), same
    * stop rule, same greedy [[fuse]] as the distributed path and
    * [[encodeWord]]; exposed for the spec that pins the equality.
    */
  private[operators] def trainLocal(vocab: Array[(Seq[String], Long)],
                                    numMerges: Int, minCount: Long,
                                    rankOffset: Int = 0): Seq[Merge] = {
    var words = vocab.map { case (s, c) => (s.toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < numMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, cnt) <- words; i <- 0 until syms.length - 1)
        pc.update((syms(i), syms(i + 1)),
          pc.getOrElse((syms(i), syms(i + 1)), 0L) + cnt)
      if (pc.isEmpty) done = true
      else {
        // tie-break in UTF-8 byte order — the collation the distributed
        // route's orderBy(asc("a"), asc("b")) uses; the JVM's UTF-16
        // ordering disagrees for U+E000+ vs supplementary-plane symbols
        val ((a, b), c) = pc.minBy { case ((a2, b2), c2) => (-c2, a2, b2) }(
          Ordering.Tuple3(Ordering.Long, graft.util.Utf8Order,
            graft.util.Utf8Order))
        if (c < minCount) done = true
        else {
          merges += Merge(rankOffset + merges.length, a, b, c)
          words = words.map { case (syms, cnt) => (fuse(syms, a, b), cnt) }
        }
      }
    }
    merges.toSeq
  }

  /** One greedy left-to-right non-overlapping merge pass — the imperative
    * twin of [[mergePair]], shared by [[encodeWord]] and [[trainLocal]].
    */
  private def fuse(syms: Vector[String], a: String, b: String): Vector[String] =
    if (syms.length < 2) syms
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b)
          out(out.length - 1) = a + b
        else out += x
      }
      out.toVector
    }

  /** Persist a learned merge list: one parquet row per merge. A tokenizer
    * is trained once and applied for the life of a model — the merge table
    * must outlive the training session (and version like any other model
    * artifact; compose with [[graft.pipeline.IndexVersions]] for sealed
    * publishes).
    */
  def write(merges: Seq[Merge], path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    merges.toDF("rank", "a", "b", "count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reopen a persisted merge list in rank order (merge-count rows — tiny,
    * driver-side by design: the list broadcasts into [[encodeWords]]).
    */
  def open(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("rank", "a", "b", "count").orderBy("rank")
      .as[(Int, String, String, Long)].collect()
      .map { case (r, a, b, c) => Merge(r, a, b, c) }.toSeq
  }

  /** Replay the merge list over one word's base symbols — the same greedy
    * fold as [[mergePair]], imperatively. Kept in lockstep with the
    * expression (BpeSpec asserts equality), so encode-time and train-time
    * segmentations can never diverge.
    */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    // split by CODE POINT, matching [[baseSymbols]] (Spark substr is
    // code-point addressed): a per-code-UNIT split would break every
    // supplementary-plane character (emoji, rare CJK) into lone
    // surrogates the merge table never saw at train time
    val cps = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      cps += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    var syms = cps.result() :+ EndOfWord
    merges.foreach { m => syms = fuse(syms, m.a, m.b) }
    syms
  }

  /** `(word, pieces)` for a `word` column of distinct words. Imperative per
    * word ON PURPOSE: replaying N merges as nested column expressions builds
    * an N-deep codegen tree (compile-time blowup), while this table is
    * vocab-sized — the corpus-scale work stays declarative in [[encode]].
    */
  def encodeWords(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val ms = merges
    words.select("word").as[String]
      .map(w => (w, encodeWord(w, ms)))
      .toDF("word", "pieces")
  }

  /** Tokenize the corpus with a trained merge list: `(idCol, pieces)` —
    * the document's subword sequence in order. One posexplode + join
    * against the encoded DISTINCT vocab + per-doc reassembly; docs with no
    * tokens get an empty piece array.
    *
    * The vocab side is NOT hint-broadcast on purpose: a tokenizer vocab is
    * usually broadcast-sized and AQE will pick the broadcast join on its
    * own, but a web-scale corpus's distinct-word table can run to 10^8
    * rows, where a forced broadcast is a driver OOM — there the planner's
    * shuffle join on the word key is the correct shape.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val vocab = encodeWords(
      docs.select(explode(tokens(col(textCol))).as("word")).distinct(), merges)
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

  /** Reconstruct normalized text (lowercased, single-spaced — exactly
    * `concat_ws(" ", tokens(text))`) from a piece sequence: concatenate,
    * then every [[EndOfWord]] becomes a word boundary.
    */
  def decode(pieces: Column): Column =
    rtrim(regexp_replace(array_join(pieces, ""), EndOfWord, " "))
}
