package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // The BPE walkthrough corpus reused: low x5, lower x2, newest x6,
  // widest x3 — unit/pair counts hand-checkable.
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("baseSymbols: bare initial, ##-prefixed continuations") {
    val syms = Seq("low", "a").toDF("word")
      .select(col("word"), WordPiece.baseSymbols(col("word")).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(syms("low") === Seq("l", "##o", "##w"))
    assert(syms("a") === Seq("a"))
  }

  test("scoredPairs: exact counts and one-division scores") {
    val sp = WordPiece.scoredPairs(WordPiece.initialWords(corpus, "text"))
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // hand-computed: (l,##o) in low(5)+lower(2); ##w in low+lower+newest;
    // ##e twice per newest; (##e,##s) in newest(6)+widest(3)
    assert(sp(("l", "##o")) === ((7L, 7L, 7L, 7.0 / 49.0)))
    assert(sp(("##o", "##w")) === ((7L, 7L, 13L, 7.0 / 91.0)))
    assert(sp(("##w", "##e")) === ((8L, 13L, 17L, 8.0 / 221.0)))
    assert(sp(("##e", "##s")) === ((9L, 17L, 9L, 9.0 / 153.0)))
    assert(sp(("w", "##i")) === ((3L, 3L, 3L, 3.0 / 9.0)))
    assert(sp(("##i", "##d")) === ((3L, 3L, 3L, 3.0 / 9.0)))
  }

  test("first merge maximizes the likelihood ratio with UTF-8 tie-break") {
    // (w,##i) and (##i,##d) tie at exactly 3.0/9.0 (identical IEEE
    // division); '#' (0x23) sorts before 'w', so (##i,##d) wins
    val merges = WordPiece.train(corpus, "text", numMerges = 1)
    assert(merges === Seq(WordPiece.Merge(0, "##i", "##d", 3L, 3.0 / 9.0)))
    assert(WordPiece.fused("##i", "##d") === "##id")
  }

  test("local and distributed training routes are bit-identical") {
    val local = WordPiece.train(corpus, "text", numMerges = 12)
    val dist = WordPiece.train(corpus, "text", numMerges = 12,
      localVocabLimit = 0L)
    assert(local === dist)
    assert(local.map(_.rank) === local.indices)
    assert(local.forall(_.count >= 2L))
  }

  test("local == distributed on a randomized corpus") {
    val rnd = new scala.util.Random(4242)
    val words = Seq("spark", "scala", "shuffle", "scan", "sort", "sketch",
      "x", "zz")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val local = WordPiece.train(docs, "text", numMerges = 15)
    val dist = WordPiece.train(docs, "text", numMerges = 15,
      localVocabLimit = 0L)
    assert(local === dist)
  }

  test("mergePair expression equals the greedy fold, incl. overlap runs") {
    // pair (##a,##a) over "baaa": greedy left-to-right fuses positions
    // 2-3, leaving position 4 alone — never the overlapping 3-4 fuse
    val out = Seq("baaa", "aaaa", "bab").toDF("word")
      .select(col("word"),
        WordPiece.mergePair(WordPiece.baseSymbols(col("word")), "##a", "##a")
          .as("m"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("baaa") === Seq("b", "##aa", "##a"))
    assert(out("aaaa") === Seq("a", "##aa", "##a"))
    assert(out("bab") === Seq("b", "##a", "##b"))
  }

  test("encodeWord is maximal munch with whole-word UNK") {
    val vocab = Set("un", "##able", "##a", "u", "a", "##b", "##l", "##e")
    assert(WordPiece.encodeWord("unable", vocab) === Seq("un", "##able"))
    // longest FIRST match wins even when a shorter split would also tile
    assert(WordPiece.encodeWord("uable", vocab) === Seq("u", "##able"))
    // untileable position -> the whole word is [UNK]
    assert(WordPiece.encodeWord("unablez", vocab) === Seq(WordPiece.Unk))
    // over the char guard -> [UNK] outright
    assert(WordPiece.encodeWord("aaaaaa", Set("a", "##a"),
      maxCharsPerWord = 5) === Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("", vocab) === Seq.empty)
  }

  test("corpus encode: token order, empty docs, exact decode roundtrip") {
    val merges = WordPiece.train(corpus, "text", numMerges = 10)
    val alpha = WordPiece.alphabet(corpus, "text")
    val withEmpty = corpus.union(Seq((5L, "")).toDF("doc_id", "text"))
    val enc = WordPiece.encode(withEmpty, "doc_id", "text", alpha, merges)
    val got = enc.as[(Long, Seq[String])].collect().toMap
    assert(got(5L) === Seq.empty)
    val vocab = WordPiece.vocabulary(alpha, merges)
    assert(got(1L) === Seq.fill(5)(WordPiece.encodeWord("low", vocab)).flatten)
    // self-encode is UNK-free (alphabet floor) and decodes exactly
    assert(!got.values.flatten.exists(_ == WordPiece.Unk))
    val rt = enc.join(withEmpty, Seq("doc_id"))
      .select((WordPiece.decode(col("pieces")) ===
        concat_ws(" ", graft.functions.TextFunctions.tokens(col("text"))))
        .as("ok"))
      .agg(min("ok")).as[Boolean].collect()
    assert(rt === Array(true))
  }

  test("model() equals the separate alphabet + train pair") {
    val (alpha, merges) = WordPiece.model(corpus, "text", numMerges = 10)
    assert(alpha === WordPiece.alphabet(corpus, "text"))
    assert(merges === WordPiece.train(corpus, "text", numMerges = 10))
    // and through the distributed route too
    val (alphaD, mergesD) = WordPiece.model(corpus, "text", numMerges = 10,
      localVocabLimit = 0L)
    assert(alphaD === alpha)
    assert(mergesD === merges)
  }

  test("store write/open round-trips the model bit-exactly") {
    val merges = WordPiece.train(corpus, "text", numMerges = 8)
    val alpha = WordPiece.alphabet(corpus, "text")
    val dir = java.nio.file.Files.createTempDirectory("wp_store").toString
    WordPiece.write(alpha, merges, s"$dir/wp", spark)
    val (a2, m2) = WordPiece.open(spark, s"$dir/wp")
    assert(a2 === alpha)
    assert(m2 === merges)
    // the stored model encodes exactly like the fresh one
    val e1 = WordPiece.encode(corpus, "doc_id", "text", alpha, merges)
      .as[(Long, Seq[String])].collect().toMap
    val e2 = WordPiece.encode(corpus, "doc_id", "text", a2, m2)
      .as[(Long, Seq[String])].collect().toMap
    assert(e1 === e2)
  }
}
