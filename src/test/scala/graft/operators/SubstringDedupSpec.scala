package graft.operators

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // k=3 fixture, hand-computed:
  //  d1/d2 share the token runs "c d e f" (windows "c d e", "d e f");
  //  d3 shares nothing; d4 repeats "m n o" WITHIN itself only;
  //  d5 contains the shared "c d e" twice, far apart (two islands);
  //  d6 is exactly one shared window (fully covered); d7 is sub-window.
  private def docs = Seq(
    (1L, "a b c d e f"),
    (2L, "x y c d e f z"),
    (3L, "p q r s"),
    (4L, "m n o m n o m n o"),
    (5L, "c d e 1 2 3 4 5 c d e"),
    (6L, "c d e"),
    (7L, "zz")
  ).toDF("doc_id", "text")

  private def reportMap(keepFirst: Boolean = false) =
    SubstringDedup.report(docs, "doc_id", "text", k = 3, keepFirst = keepFirst)
      .select("doc_id", "n_tokens", "n_windows", "n_dup_windows", "covered_tokens", "dup_frac")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("report: hand-computed spans, adjacency merge, within-doc repeats exempt") {
    val m = reportMap()
    // d1: dup windows at pos 3,4 -> union [3,6] = 4 tokens of 6
    assert(m(1L) === ((1L, 6L, 4L, 2L, 4L, 0.666667)))
    // d2: dup windows at pos 3,4 -> union [3,6] = 4 of 7
    assert(m(2L) === ((2L, 7L, 5L, 2L, 4L, 0.571429)))
    // d3: clean
    assert(m(3L) === ((3L, 4L, 2L, 0L, 0L, 0.0)))
    // d4: repeats only within itself -> NOT flagged (minDocs counts docs)
    assert(m(4L) === ((4L, 9L, 7L, 0L, 0L, 0.0)))
    // d5: "c d e" at pos 1 and 9 -> [1,3] u [9,11] = 6 of 11
    assert(m(5L) === ((5L, 11L, 9L, 2L, 6L, 0.545455)))
    // d6: the single window covers the whole doc
    assert(m(6L) === ((6L, 3L, 1L, 1L, 3L, 1.0)))
    // d7: shorter than k -> zero windows, zero coverage
    assert(m(7L) === ((7L, 1L, 0L, 0L, 0L, 0.0)))
  }

  test("keepFirst exempts each gram's lowest-id document") {
    val m = reportMap(keepFirst = true)
    // "c d e" / "d e f" both first appear in d1 -> d1 now clean
    assert(m(1L)._4 === 0L && m(1L)._6 === 0.0)
    // d2/d5/d6 still flagged (they are not the canonical holder)
    assert(m(2L)._5 === 4L)
    assert(m(5L)._5 === 6L)
    assert(m(6L)._5 === 3L)
  }

  test("removeSpans cuts exactly the covered tokens; clean docs verbatim") {
    val out = SubstringDedup.removeSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "a b")
    assert(out(2L) === "x y z")
    assert(out(3L) === "p q r s") // untouched: original text, not re-joined
    assert(out(4L) === "m n o m n o m n o")
    assert(out(5L) === "1 2 3 4 5") // both islands cut
    assert(out(6L) === "") // fully duplicated doc -> empty
    assert(out(7L) === "zz")
  }

  test("removeSpans(keepFirst) leaves the canonical copy intact") {
    val out = SubstringDedup.removeSpans(docs, "doc_id", "text", k = 3, keepFirst = true)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "a b c d e f")
    assert(out(2L) === "x y z")
    assert(out(6L) === "")
  }

  test("minDocs raises the duplication bar") {
    // "c d e" occurs in d1,d2,d5,d6 (4 docs); "d e f" only in d1,d2
    val m = SubstringDedup.report(docs, "doc_id", "text", k = 3, minDocs = 3)
      .select("doc_id", "covered_tokens").as[(Long, Long)].collect().toMap
    assert(m(1L) === 3L) // only [3,5] ("c d e") left
    assert(m(2L) === 3L)
    assert(m(6L) === 3L)
  }

  test("hashGrams=false (string keys) is result-identical to the hash path") {
    val real = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    def rows(hashed: Boolean) =
      SubstringDedup.report(real, "doc_id", "text", k = 8, hashGrams = hashed)
        .orderBy("doc_id").collect().toSeq
    assert(rows(true) === rows(false))
  }

  test("sf0.001 corpus: real duplicated spans exist and fractions are sane") {
    val real = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val rep = SubstringDedup.report(real, "doc_id", "text", k = 8)
    val (nDup, bad) = (
      rep.where($"n_dup_windows" > 0).count(),
      rep.where($"dup_frac" < 0.0 || $"dup_frac" > 1.0 ||
        $"covered_tokens" > $"n_tokens").count())
    assert(nDup > 0, "expected some cross-doc duplicated 8-gram spans in testdata")
    assert(bad === 0L)
  }
}
