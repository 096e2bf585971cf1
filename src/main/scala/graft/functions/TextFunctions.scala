package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * All of these are pure Catalyst expression compositions (no UDFs), so they
  * stay inside whole-stage codegen and distribute trivially: every function
  * is a narrow per-row map over the text column.
  */
object TextFunctions {

  /** Non-whitespace token runs. Deterministic, locale-free. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** Deterministic md5 coin over `(seed, salt, key)`: the first `widthHex`
    * hex chars of `md5("{seed}:{salt}:{key}")` as a non-negative long —
    * the hashed-randomness primitive behind reproducible sample prep
    * (span corruption, FIM) and shard assignment. 4 hex chars (16 bits)
    * suffice for small-modulus draws (bias ~2^-16); use 15 (60 bits)
    * whenever the modulus scales with data, e.g. positions or document
    * lengths. The exact string/width is replayed by the SQL oracles —
    * change both sides together.
    */
  def hashCoin(seed: Long, salt: String, key: Column,
               widthHex: Int = 4): Column = {
    require(widthHex >= 1 && widthHex <= 15, s"widthHex in [1,15]: $widthHex")
    conv(substring(
      md5(concat(lit(s"$seed:$salt:"), key.cast("string")).cast("binary")),
      1, widthHex), 16, 10).cast("long")
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles as space-joined strings; empty array when the
    * document has fewer than n tokens.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - lit(n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle set (for Jaccard). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(wordShingles(text, n))

  // --- native fast paths (graft.expressions via GraftFunctions.register) ---

  /** Native distinct word n-gram shingles — same strings as [[shingleSet]],
    * ~1000x faster than the interpreted HOF pipeline.
    */
  def shingleSetFast(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** Native non-distinct word n-grams (corpus frequency counting). */
  def shinglesAllFast(text: Column, n: Int): Column =
    call_function("graft_shingles_all", text, lit(n))

  /** Native MinHash signature straight from text (null if < n tokens). */
  def minHashFast(text: Column, n: Int, k: Int): Column =
    call_function("graft_minhash", text, lit(n), lit(k))

  /** Native 64-bit SimHash straight from text. */
  def simHashFast(text: Column): Column = call_function("graft_simhash", text)

  /** Native per-window 64-bit gram hashes in positional order — the
    * substring-dedup hot path without materializing gram strings.
    */
  def gramHashesFast(text: Column, k: Int): Column =
    call_function("graft_gram_hashes", text, lit(k))

  /** MinHash signature: k independent min-hashes over the shingle set.
    * Hash family: xxhash64 seeded by the hash index (prepended as a column).
    * Null when the shingle set is empty.
    *
    * Single `aggregate` pass with a k-slot accumulator — NOT k separate
    * `array_min(transform(...))` branches, which would duplicate the
    * (expensive) shingle-producing subtree k times in the plan and blow the
    * expression out of efficient evaluation.
    */
  def minHashSignature(shingles: Column, k: Int): Column =
    when(size(shingles) > 0,
      aggregate(
        shingles,
        array_repeat(lit(Long.MaxValue), k),
        (acc, s) => zip_with(acc, sequence(lit(0), lit(k - 1)),
          (m, i) => least(m, xxhash64(i, s)))))

  /** LSH band buckets from a MinHash signature: bands of `rowsPerBand` rows,
    * each hashed to a single bucket id. Docs sharing any (band, bucket) pair
    * are near-dup candidates.
    */
  def lshBuckets(signature: Column, rowsPerBand: Int): Column =
    when(size(signature) >= rowsPerBand,
      transform(sequence(lit(0), (size(signature) / rowsPerBand).cast("int") - 1),
        b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))
          .cast("array<string>").cast("string"))))
      .otherwise(array().cast("array<bigint>"))

  /** 64-bit SimHash over the token multiset: per bit, sum +1/-1 weighted by
    * each token-hash's bit, take the sign. Pure expression: one
    * `aggregate` over tokens with a 64-slot count array accumulator.
    */
  def simHash64(toks: Column): Column = {
    val bitIdx = sequence(lit(0), lit(63))
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, bitIdx, (a, b) =>
          a + when((call_function("shiftright", h, b.cast("int")).bitwiseAND(1L)) === 1L, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(counts, bitIdx, (c, b) =>
        when(c > 0, call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(lit(0L))),
      lit(0L), (s, v) => s.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling-hash document fingerprint over normalized text: lowercase,
    * collapse non-alphanumerics to single spaces, md5. Equal fingerprints ⇔
    * equal normalized content. Alphanumeric means UNICODE letters/digits
    * (`\p{L}\p{N}`) — an ASCII-only class would strip every character of
    * a Chinese/Cyrillic/Arabic document, fingerprint all of them as the
    * empty string, and a dedup keyed on this would silently delete every
    * non-Latin doc but one. (Replayed by the q18 oracle — RE2's
    * `[^\p{L}\p{N}]` agrees with Java's on this class.)
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " ")))

  // --- language id (n-gram/stopword heuristic) -----------------------------

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** Stopword hits for one language. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang).map(lit): _*)))

  /** Language with the most stopword hits; ties resolved by the fixed
    * language order en,fr,es,de,zh; all-zero scores → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val order = Seq("en", "fr", "es", "de", "zh")
    val scores = order.map(l => stopwordHits(t, l))
    val best = greatest(scores: _*)
    order.zip(scores).foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Heuristic quality metrics. Ratios are over character length (0 for
    * empty text).
    */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  def digitRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0, stopwordHits(t, "en").cast("double") / size(t)).otherwise(lit(0.0))
  }

  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      aggregate(t, lit(0L), (s, x) => s + length(x)).cast("double") / size(t))
      .otherwise(lit(0.0))
  }

  /** Composite [0,1] quality score: rewards mid-length docs with word-like
    * tokens and English stopwords, penalizes punctuation/digit noise.
    * Deterministic closed form so it can be mirrored in SQL oracles.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(20.0), lit(1.0))
    val swScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val noise = least(punctRatio(text) * 4.0 + digitRatio(text) * 2.0, lit(1.0))
    round((lenScore * 0.4 + swScore * 0.4 + (lit(1.0) - noise) * 0.2), 6)
  }
}
