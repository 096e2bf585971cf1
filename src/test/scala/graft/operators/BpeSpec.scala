package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // The Sennrich/GPT-2 walkthrough corpus: low x5, lower x2, newest x6,
  // widest x3 — frequencies hand-checkable.
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("round-0 pair counts are frequency-weighted and exact") {
    val pc = Bpe.pairCounts(Bpe.initialWords(corpus, "text"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // hand-computed: l-o in low(5)+lower(2); w-e in lower(2)+newest(6);
    // e-s in newest(6)+widest(3); t-</w> in newest(6)+widest(3)
    assert(pc(("l", "o")) === 7L)
    assert(pc(("o", "w")) === 7L)
    assert(pc(("w", "e")) === 8L)
    assert(pc(("e", "s")) === 9L)
    assert(pc(("s", "t")) === 9L)
    assert(pc(("t", Bpe.EndOfWord)) === 9L)
    assert(pc(("n", "e")) === 6L)
  }

  test("first merge wins the count with lexicographic tie-break") {
    // (e,s), (s,t), (t,</w>) all count 9 -> (e,s) by (a,b) ascending
    val merges = Bpe.train(corpus, "text", numMerges = 1)
    assert(merges === Seq(Bpe.Merge(0, "e", "s", 9L)))
  }

  test("training converges and minCount stops the loop") {
    val merges = Bpe.train(corpus, "text", numMerges = 100, minCount = 2L)
    // loop must stop on its own well before 100 (4 distinct words)
    assert(merges.length < 40)
    assert(merges.map(_.rank) === merges.indices)
    // counts never increase as symbols coarsen... not strictly monotone in
    // BPE, but every retained merge must clear minCount
    assert(merges.forall(_.count >= 2L))
    // after full training each word is one or few symbols; "newest" (the
    // most frequent) must have fused completely
    val pieces = Bpe.encodeWord("newest", merges)
    assert(pieces === Seq("newest" + Bpe.EndOfWord))
  }

  test("mergePair expression equals the imperative fold, incl. overlap runs") {
    val words = Seq("aaa", "aab", "baa", "abab", "xyx").toDF("word")
      .select(col("word"), Bpe.baseSymbols(col("word")).as("syms"))
    val viaExpr = words.select(col("word"),
        Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .as[(String, Seq[String])].collect().toMap
    val viaLocal = Seq("aaa", "aab", "baa", "abab", "xyx")
      .map(w => w -> Bpe.encodeWord(w, Seq(Bpe.Merge(0, "a", "a", 1L)))).toMap
    assert(viaExpr === viaLocal)
    // greedy left-to-right: "aaa" -> [aa, a, </w>], never [a, aa, </w>]
    assert(viaExpr("aaa") === Seq("aa", "a", Bpe.EndOfWord))
  }

  test("encode assembles per-doc piece sequences in token order") {
    val merges = Bpe.train(corpus, "text", numMerges = 6)
    val enc = Bpe.encode(corpus, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    // doc 1 = "low" x5: identical segmentation repeated five times
    val lowPieces = Bpe.encodeWord("low", merges)
    assert(enc(1L) === Seq.fill(5)(lowPieces).flatten)
    // piece streams decode back to the normalized text
    val dec = Bpe.encode(corpus, "doc_id", "text", merges)
      .select(col("doc_id"), Bpe.decode(col("pieces")).as("rt"))
      .as[(Long, String)].collect().toMap
    assert(dec(2L) === "lower lower")
    assert(dec(4L) === "widest widest widest")
  }

  test("empty and token-less docs encode to empty piece arrays") {
    val docs = Seq((1L, "one doc"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Seq[String])].collect().toMap
    assert(enc(2L) === Seq.empty)
    assert(enc(3L) === Seq.empty)
    assert(enc(1L).nonEmpty)
  }

  test("write/open round-trips the merge table; reopened encode is identical") {
    val merges = Bpe.train(corpus, "text", numMerges = 6)
    val dir = java.nio.file.Files.createTempDirectory("bpe_store").toString
    Bpe.write(merges, s"$dir/merges", spark)
    val reopened = Bpe.open(spark, s"$dir/merges")
    assert(reopened === merges)
    val a = Bpe.encode(corpus, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    val b = Bpe.encode(corpus, "doc_id", "text", reopened)
      .as[(Long, Seq[String])].collect().toMap
    assert(a === b)
  }

  test("local driver-side rounds equal distributed rounds merge for merge") {
    // localVocabLimit = 0 forces every round through the distributed path;
    // the default takes the collected tail — results must be bit-identical
    // (same argmax, same (a, b) tie-break, same greedy fold)
    val viaLocal = Bpe.train(corpus, "text", numMerges = 25, minCount = 1L)
    val viaDist = Bpe.train(corpus, "text", numMerges = 25, minCount = 1L,
      localVocabLimit = 0L)
    assert(viaLocal === viaDist)
    // and on a corpus with heavy ties + overlap runs ("aaa bb aaa")
    val tricky = Seq((1L, "aaa bb aaa ababa"), (2L, "bb cc bb aaa")).toDF("doc_id", "text")
    val l2 = Bpe.train(tricky, "text", numMerges = 12, minCount = 1L)
    val d2 = Bpe.train(tricky, "text", numMerges = 12, minCount = 1L,
      localVocabLimit = 0L)
    assert(l2 === d2)
  }

  test("supplementary-plane characters: one symbol at train AND encode time") {
    // baseSymbols splits by Spark substr = code points; encodeWord must
    // match — a code-UNIT split would hand the merge replay lone
    // surrogates the training pass never saw
    val emoji = "👍" // U+1F44D thumbs-up
    assert(Bpe.encodeWord(s"$emoji x", Nil) ===
      Seq(emoji, " ", "x", "</w>"), "code-point split broke")
    val docs = Seq((1L, s"$emoji$emoji ab $emoji$emoji ab"),
      (2L, s"ab $emoji$emoji")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6, minCount = 1L)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .select(explode(col("pieces")).as("p"))
      .as[String].collect().toSet
    assert(!enc.exists(p => p.exists(c => Character.isSurrogate(c) &&
        p.codePointCount(0, p.length) == p.length)),
      s"lone surrogate pieces emitted: $enc")
    // and the emoji pair merge actually learned and applied
    assert(enc.exists(_.contains(emoji)), enc)
    // route parity holds on the emoji corpus too
    val dist = Bpe.train(docs, "text", numMerges = 6, minCount = 1L,
      localVocabLimit = 0L)
    assert(merges === dist)
  }

  test("extend continues training exactly: extend(train(k), m) == train(k+m)") {
    val full = Bpe.train(corpus, "text", numMerges = 14, minCount = 1L)
    assert(full.length === 14)
    for (k <- Seq(0, 1, 6, 13)) {
      val ext = Bpe.extend(corpus, "text", full.take(k), numMore = 14 - k,
        minCount = 1L)
      assert(ext === full, s"prefix-stability broke at split $k")
    }
    // and across the local/distributed route boundary: distributed
    // continuation from a locally-trained prefix (and vice versa)
    val extDist = Bpe.extend(corpus, "text", full.take(6), numMore = 8,
      minCount = 1L, localVocabLimit = 0L)
    assert(extDist === full)
    val fullDist = Bpe.train(corpus, "text", numMerges = 6, minCount = 1L,
      localVocabLimit = 0L)
    assert(Bpe.extend(corpus, "text", fullDist, numMore = 8, minCount = 1L)
      === full)
  }

  test("sf0.001 corpus: roundtrip identity and compression both hold") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 20)
    assert(merges.length === 20) // real corpus: plenty of frequent pairs
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    val chk = docs
      .join(enc, Seq("doc_id"))
      .select(
        (Bpe.decode(col("pieces")) === concat_ws(" ", tokens(col("text"))))
          .as("rt"),
        size(col("pieces")).cast("long").as("n_pieces"),
        (length(concat_ws(" ", tokens(col("text")))) + 1).cast("long").as("n_chars"))
      .agg(min("rt").as("all_rt"), sum("n_pieces").as("p"), sum("n_chars").as("c"))
      .as[(Boolean, Long, Long)].head()
    assert(chk._1, "decode(encode(x)) must equal normalized x for every doc")
    // 20 merges must compress vs character-level (pieces < raw chars)
    assert(chk._2 < chk._3, s"pieces ${chk._2} !< chars ${chk._3}")
  }
}
