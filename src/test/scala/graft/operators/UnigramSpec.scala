package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "internationalization international nation"),
    (2L, "nation nation national rational"),
    (3L, "the the the rat ration station"),
    (4L, "internal internals national stations")
  ).toDF("doc_id", "text")

  test("viterbi picks the max-likelihood segmentation with longer-piece ties") {
    val logP = Map("ab" -> math.log(0.4), "a" -> math.log(0.3),
      "b" -> math.log(0.3))
    // ab as one piece: log 0.4 > log 0.3 + log 0.3
    assert(Unigram.viterbi("ab", logP) === Seq("ab"))
    // exact tie between {cd} and {c,d} impossible here; test the longest-
    // first preference on an engineered exact tie: P(xy) == P(x)P(y)
    val tie = Map("xy" -> math.log(0.25), "x" -> math.log(0.5),
      "y" -> math.log(0.5))
    assert(Unigram.viterbi("xy", tie) === Seq("xy"))
  }

  test("unknown characters fall back to single-char pieces; roundtrip exact") {
    val logP = Map("a" -> math.log(1.0))
    assert(Unigram.viterbi("aqa", logP) === Seq("a", "q", "a"))
    assert(Unigram.viterbi("", logP) === Seq.empty)
    assert(Unigram.decodeWord(Unigram.viterbi("zzqqy", logP)) === "zzqqy")
  }

  test("training learns frequent substrings and respects the vocab budget") {
    val pieces = Unigram.train(corpus, "text", vocabSize = 40)
    assert(pieces.size <= 40)
    val inv = pieces.map(_.piece).toSet
    // every corpus character present (segmentability guarantee)
    val chars = corpus.select(explode(tokens(col("text"))).as("w"))
      .as[String].collect().flatMap(_.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(inv))
    // the dominant multi-char substring families survive pruning
    assert(inv.exists(p => p.length >= 3 && "nation".contains(p)),
      s"expected a 'nation'-family piece in $inv")
    // probs normalized: sum of exp(logProb) ~= 1
    val mass = pieces.iterator.map(p => math.exp(p.logProb)).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"piece mass $mass != 1")
  }

  test("local and distributed training routes are bit-identical") {
    val viaLocal = Unigram.train(corpus, "text", vocabSize = 30)
    val viaDist = Unigram.train(corpus, "text", vocabSize = 30,
      localVocabLimit = 0L)
    assert(viaLocal === viaDist)
  }

  test("route parity holds with supplementary-plane characters") {
    // an emoji substring is ONE Spark code point but TWO Java code units:
    // seedDist must classify "single chars" by the Java rule seedLocal
    // uses, or the seed sets (not just order) diverge between routes
    val docs = Seq((1L, "👍ab 👍ab cd👍 ab"), (2L, "cd👍 👍ab ef"))
      .toDF("doc_id", "text")
    val viaLocal = Unigram.train(docs, "text", vocabSize = 25)
    val viaDist = Unigram.train(docs, "text", vocabSize = 25,
      localVocabLimit = 0L)
    assert(viaLocal === viaDist)
  }

  test("encode segments in token order; whole-corpus roundtrip holds") {
    val pieces = Unigram.train(corpus, "text", vocabSize = 40)
    val logP = pieces.map(p => p.piece -> p.logProb).toMap
    val enc = Unigram.encode(corpus, "doc_id", "text", pieces)
      .as[(Long, Seq[String])].collect().toMap
    // doc 3: "the the the rat ration station" — word-order concatenation
    val expected3 = Seq("the", "the", "the", "rat", "ration", "station")
      .flatMap(w => Unigram.viterbi(w, logP))
    assert(enc(3L) === expected3)
    // roundtrip through the per-word path equals the normalized text
    val rt = Unigram.decodeJoined(corpus, "doc_id", "text", pieces)
      .join(corpus.select(col("doc_id"),
        concat_ws(" ", tokens(col("text"))).as("norm")), Seq("doc_id"))
      .where(col("text") =!= col("norm"))
    assert(rt.isEmpty, "per-word decode must reproduce normalized text")
  }

  test("empty and token-less docs encode to empty piece arrays") {
    val docs = Seq((1L, "one doc"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val pieces = Unigram.train(docs, "text", vocabSize = 20)
    val enc = Unigram.encode(docs, "doc_id", "text", pieces)
      .as[(Long, Seq[String])].collect().toMap
    assert(enc(2L) === Seq.empty)
    assert(enc(3L) === Seq.empty)
    assert(enc(1L).nonEmpty)
  }

  test("write/open round-trips the inventory; reopened encode is identical") {
    val pieces = Unigram.train(corpus, "text", vocabSize = 40)
    val dir = java.nio.file.Files.createTempDirectory("unigram_store").toString
    Unigram.write(pieces, s"$dir/pieces", spark)
    val reopened = Unigram.open(spark, s"$dir/pieces")
    assert(reopened.map(_.piece).sorted === pieces.map(_.piece).sorted)
    val a = Unigram.encode(corpus, "doc_id", "text", pieces)
      .as[(Long, Seq[String])].collect().toMap
    val b = Unigram.encode(corpus, "doc_id", "text", reopened)
      .as[(Long, Seq[String])].collect().toMap
    assert(a === b)
  }

  test("sf0.001 corpus: compression vs character-level and roundtrip") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val pieces = Unigram.train(docs, "text", vocabSize = 200)
    val enc = Unigram.encode(docs, "doc_id", "text", pieces)
    val chk = docs.join(enc, Seq("doc_id"))
      .select(size(col("pieces")).cast("long").as("np"),
        aggregate(tokens(col("text")), lit(0L), (a, w) => a + length(w)).as("nc"))
      .agg(sum("np").as("p"), sum("nc").as("c")).as[(Long, Long)].head()
    assert(chk._1 < chk._2, s"pieces ${chk._1} !< chars ${chk._2}")
    val rt = Unigram.decodeJoined(docs, "doc_id", "text", pieces)
      .join(docs.select(col("doc_id"),
        concat_ws(" ", tokens(col("text"))).as("norm")), Seq("doc_id"))
      .where(col("text") =!= col("norm"))
    assert(rt.isEmpty)
  }
}
