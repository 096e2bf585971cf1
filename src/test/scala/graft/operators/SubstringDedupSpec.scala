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

  test("incremental index: reportAgainst equals full recompute on the union") {
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d e f z"),
      (3L, "p q r s t u")
    ).toDF("doc_id", "text")
    // 10 shares "c d e" with the corpus; 11 is clean; 12/13 share a gram
    // only with each other (within-batch duplication)
    val batch = Seq(
      (10L, "m n c d e o"),
      (11L, "h i j k l w"),
      (12L, "q1 q2 q3 q4"),
      (13L, "z9 q1 q2 q3 z8")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("substr_idx").toString
    SubstringDedup.buildIndex(corpus, "doc_id", "text", k = 3, s"$dir/v0")
    val inc = SubstringDedup.reportAgainst(spark, s"$dir/v0", batch, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val full = SubstringDedup.report(corpus.union(batch), "doc_id", "text", k = 3)
      .where($"doc_id" >= 10L).orderBy("doc_id").collect().toSeq
    assert(inc === full)
    // sanity on the planted structure
    val m = inc.map(r => r.getLong(0) -> r.getAs[Long]("covered_tokens")).toMap
    assert(m(10L) === 3L) // "c d e"
    assert(m(11L) === 0L)
    assert(m(12L) === 3L) // "q1 q2 q3" at pos 1 -> [1,3]
    assert(m(13L) === 3L) // "q1 q2 q3" at pos 2 -> [2,4]
  }

  test("incremental removeSpansAgainst equals full-union removeSpans on the batch") {
    val corpus = Seq((1L, "a b c d e f"), (2L, "x y c d e f z")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "m n c d e o"), (11L, "h i j k l w"),
      (12L, "q1 q2 q3 q4"), (13L, "z9 q1 q2 q3 z8")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("substr_idx3").toString
    SubstringDedup.buildIndex(corpus, "doc_id", "text", k = 3, s"$dir/v0")
    val inc = SubstringDedup
      .removeSpansAgainst(spark, s"$dir/v0", batch, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val full = SubstringDedup
      .removeSpans(corpus.union(batch), "doc_id", "text", k = 3)
      .where($"doc_id" >= 10L).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(inc === full)
    val m = inc.toMap
    assert(m(10L) === "m n o")
    assert(m(11L) === "h i j k l w") // untouched: verbatim
    assert(m(12L) === "q4")
    assert(m(13L) === "z9 z8")
  }

  test("incremental index: append extends the store; replay is idempotent; compaction equal") {
    val corpusA = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val corpusB = Seq((2L, "g h i j k l")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "w1 c d e w2"),  // matches corpusA
      (11L, "w3 h i j w4")   // matches the APPENDED corpusB
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("substr_idx2").toString
    SubstringDedup.buildIndex(corpusA, "doc_id", "text", k = 3, s"$dir/v0")
    SubstringDedup.appendIndex(corpusB, "doc_id", "text", s"$dir/v0", batchId = 1)
    // replayed append (orchestrator retry) must not double-count
    SubstringDedup.appendIndex(corpusB, "doc_id", "text", s"$dir/v0", batchId = 1)
    def rep(path: String) =
      SubstringDedup.reportAgainst(spark, path, batch, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
    val viaStore = rep(s"$dir/v0")
    val m = viaStore.map(r => r.getLong(0) -> r.getAs[Long]("covered_tokens")).toMap
    assert(m(10L) === 3L && m(11L) === 3L)
    // doubled contributions would be visible at minDocs = 3: a replayed
    // append would push corpusB's grams to n_docs = 2 on their own
    val strict = SubstringDedup
      .reportAgainst(spark, s"$dir/v0", batch, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("covered_tokens")).toMap
    assert(strict(11L) === 0L, "replayed append double-counted the store")
    SubstringDedup.compactIndexTo(spark, s"$dir/v0", s"$dir/v1")
    assert(rep(s"$dir/v1") === viaStore)
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
