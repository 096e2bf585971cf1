package graft.quality

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // training corpus: "a b a b c" + "a b c" -> bigrams: (a,b)x2+(a,b)=3? no:
  // doc1: (a,b),(b,a),(a,b),(b,c); doc2: (a,b),(b,c)
  // c(a,b)=3, c(b,a)=1, c(b,c)=2; contexts: a->3... a opens (a,b),(a,b),(a,b)=3? doc1 a opens 2, doc2 a opens 1 -> n_a=3; b opens (b,a),(b,c),(b,c)=3; vocab={a,b,c}=3
  private val target = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")

  test("counts, smoothing, and the hand-computed mean log prob") {
    val m = NgramLm.train(target, "doc_id", "text", k = 1.0)
    assert(m.vocab === 3L)
    assert(m.bigrams.as[(String, String, Long)].collect().toSet ===
      Set(("a", "b", 3L), ("b", "a", 1L), ("b", "c", 2L)))
    assert(m.contexts.as[(String, Long)].collect().toSet ===
      Set(("a", 3L), ("b", 3L)))
    // score "a b c": contributions ln((3+1)/(3+3)) + ln((2+1)/(3+3))
    val out = NgramLm.scoreAvgLogProb(
        Seq((10L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", m)
      .as[(Long, Long, Double)].collect().toSeq
    val c1 = math.rint(math.log(4.0 / 6.0) * 1e6) / 1e6
    val c2 = math.rint(math.log(3.0 / 6.0) * 1e6) / 1e6
    val expected = math.rint((math.rint(c1 * 1e6) + math.rint(c2 * 1e6)) / 2.0) / 1e6
    assert(out.length === 1)
    assert(out.head._1 === 10L && out.head._2 === 2L)
    assert(math.abs(out.head._3 - expected) < 1e-9, s"${out.head._3} vs $expected")
  }

  test("releaseCaches drops every train()-pinned counted table; models still score") {
    NgramLm.releaseCaches() // clean slate (other suites may have trained)
    val before = NgramLm.cacheCount
    assert(before === 0)
    val m1 = NgramLm.train(target, "doc_id", "text")
    val m2 = NgramLm.train(Seq((9L, "x y x y")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(NgramLm.cacheCount === 2, "one pinned cache per trained model")
    NgramLm.releaseCaches()
    assert(NgramLm.cacheCount === 0)
    // a released cache recomputes transparently — the model stays usable
    val out = NgramLm.scoreAvgLogProb(
      Seq((10L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", m1)
    assert(out.count() === 1)
    assert(m2.vocab === 2L)
  }

  test("unseen bigrams and unseen contexts get smoothing mass, never -inf") {
    val m = NgramLm.train(target, "doc_id", "text", k = 1.0)
    // (c,a): context c opens no training bigram -> p = 1/(0+3) ; (a,a): seen
    // context, unseen bigram -> p = 1/(3+3)
    val out = NgramLm.scoreAvgLogProb(
        Seq((20L, "c a a")).toDF("doc_id", "text"), "doc_id", "text", m)
      .as[(Long, Long, Double)].collect().head
    val c1 = math.rint(math.log(1.0 / 3.0) * 1e6) / 1e6
    val c2 = math.rint(math.log(1.0 / 6.0) * 1e6) / 1e6
    // final rounding mirrors functions.Rounding.round6 (floor(x·1e6+0.5),
    // half-toward-+inf) — this doc's mean is an exact micro half-tie
    // (-1445185.5), precisely the case the stable rule exists for
    val mean = (math.rint(c1 * 1e6) + math.rint(c2 * 1e6)) / 1e6 / 2.0
    val expected = math.floor(mean * 1e6 + 0.5) / 1e6
    assert(math.abs(out._3 - expected) < 1e-9)
    assert(!out._3.isNegInfinity)
  }

  test("docs with fewer than two tokens are absent; in-domain beats gibberish") {
    val m = NgramLm.train(target, "doc_id", "text")
    val out = NgramLm.scoreAvgLogProb(
        Seq((1L, "a"), (2L, ""), (3L, "a b a b"), (4L, "q r s t"))
          .toDF("doc_id", "text"), "doc_id", "text", m)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out.keySet === Set(3L, 4L))
    assert(out(3L) > out(4L), "in-domain text must score higher than gibberish")
  }
}
