package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent reimplementation of the `graft_gram_hashes` chain from its
  * documented formulas, for spec cross-checks (the compiled `TextOps` is
  * private to the expressions package — re-deriving it here is the point:
  * the reference must not share code with the implementation).
  */
object WinnowRef {
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def hashString(s: String): Long = {
    var h = 1125899906842597L
    s.foreach(c => h = 31 * h + c)
    mix64(h ^ mix64(0L))
  }
  def gramHash(toks: Seq[String]): Long = {
    var h = 1125899906842597L
    toks.foreach(t => h = h * 0x100000001B3L + hashString(t))
    mix64(h)
  }
}

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def words(r: scala.util.Random, n: Int): String =
    (1 to n).map(_ => s"w${r.nextInt(5000)}").mkString(" ")

  test("decoded (pos, h) matches the documented gram-hash chain by hand") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val toks = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")
    // independent reimplementation of the documented chain (TextOps is
    // private): per-token polynomial hash -> mix64, FNV window fold -> mix64
    def h(p: Long): Long = WinnowRef.gramHash(
      toks.slice(p.toInt - 1, p.toInt - 1 + 4).toSeq) >>> 24
    assert(fps.nonEmpty)
    fps.foreach { case (p, hv) => assert(hv == h(p), s"pos $p") }
  }

  test("winnowing guarantee: a shared w+k-1 token run shares a fingerprint") {
    val r = new scala.util.Random(7)
    val shared = words(new scala.util.Random(99), 8) // k+w-1 = 4+5-1 = 8
    // plant the run at different offsets inside otherwise-unrelated docs
    val docs = Seq(
      (1L, words(r, 37) + " " + shared + " " + words(r, 23)),
      (2L, words(r, 11) + " " + shared + " " + words(r, 61))
    ).toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 5)
    val a = fp.where(col("doc_id") === 1L).select("h").as[Long].collect().toSet
    val b = fp.where(col("doc_id") === 2L).select("h").as[Long].collect().toSet
    assert(a.intersect(b).nonEmpty,
      "documents sharing a full window-length run must share a fingerprint")
  }

  test("density lands near 2/(w+1)") {
    val r = new scala.util.Random(3)
    val docs = (1 to 20).map(i => (i.toLong, words(r, 500)))
      .toDF("doc_id", "text")
    val nFp = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 5).count()
    val nGrams = 20 * (500 - 3)
    val density = nFp.toDouble / nGrams
    assert(density > 0.2 && density < 0.5, s"density $density far from 1/3")
  }

  test("overlap flags the plagiarized pair and not unrelated ones") {
    val r = new scala.util.Random(11)
    val passage = words(new scala.util.Random(5), 60)
    val docs = Seq(
      (1L, words(r, 100) + " " + passage),
      (2L, passage + " " + words(r, 150)),
      (3L, words(r, 200))
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlap(docs, "doc_id", "text", minShared = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("overlapSpans localizes the planted passage on both sides") {
    val r = new scala.util.Random(11)
    val passage = words(new scala.util.Random(5), 60)
    // doc 1 carries the passage at tokens 101-160, doc 2 at tokens 1-60
    val docs = Seq(
      (1L, words(r, 100) + " " + passage),
      (2L, passage + " " + words(r, 150)),
      (3L, words(r, 200))
    ).toDF("doc_id", "text")
    val spans = Winnow.overlapSpans(docs, "doc_id", "text",
        k = 4, w = 5, minShared = 2)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSeq
    assert(spans.forall(s => (s._1, s._2) == ((1L, 2L))),
      s"only the plagiarized pair may report spans: $spans")
    // the theorem pins the bounds: first/last w-gram window fully inside
    // the shared run has its min selected in BOTH docs, so the span
    // starts within w grams of the run start and ends within w of its end
    val s1 = spans.filter(_._3 == 1L); val s2 = spans.filter(_._3 == 2L)
    assert(s1.size == 1 && s2.size == 1,
      s"a genuine shared run must not split (gap <= w < maxGap + k): $spans")
    assert(s1.head._4 >= 101L && s1.head._4 <= 105L, s1.toSeq)
    assert(s1.head._5 >= 156L && s1.head._5 <= 160L, s1.toSeq)
    assert(s2.head._4 >= 1L && s2.head._4 <= 5L, s2.toSeq)
    assert(s2.head._5 >= 56L && s2.head._5 <= 60L, s2.toSeq)
  }

  test("overlapSpans merges nearby hits and splits distant ones") {
    val r = new scala.util.Random(17)
    val runA = words(new scala.util.Random(21), 30)
    val runB = words(new scala.util.Random(22), 30)
    // two shared runs separated by 120 unrelated tokens on each side —
    // far beyond maxGap + k, so each pair side must report TWO spans
    val docs = Seq(
      (1L, runA + " " + words(r, 120) + " " + runB),
      (2L, runA + " " + words(r, 120) + " " + runB)
    ).toDF("doc_id", "text")
    val spans = Winnow.overlapSpans(docs, "doc_id", "text",
        k = 4, w = 5, minShared = 2)
      .where(col("doc") === 1L).orderBy("span_start").collect()
    assert(spans.length === 2, spans.toSeq)
    assert(spans(0).getLong(4) <= 30L, "first span must end inside run A")
    assert(spans(1).getLong(3) >= 151L, "second span must start inside run B")
  }

  test("overlapSpansAgainst localizes on the batch side only") {
    val r = new scala.util.Random(43)
    val passage = words(new scala.util.Random(9), 60)
    val old = Seq(
      (1L, words(r, 80) + " " + passage),
      (2L, words(r, 120))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winspans").toString
    Winnow.write(old, "doc_id", "text", dir)
    // two batch docs share the passage with each other AND with store
    // doc 1; batch doc 100 carries it at tokens 51-110
    val batch = Seq(
      (100L, words(r, 50) + " " + passage),
      (101L, passage + " " + words(r, 90))
    ).toDF("doc_id", "text")
    val spans = Winnow.overlapSpansAgainst(Winnow.open(spark, dir), batch,
        "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getLong(3), x.getLong(4), x.getLong(5))).toSeq
    // every reported doc is a batch doc — the store side has no positions
    assert(spans.forall(s => s._4 >= 100L), spans)
    // new_old: batch 100 vs store 1, span inside the planted region
    val no100 = spans.filter(s => s._1 == 100L && s._2 == 1L &&
      s._3 == "new_old")
    assert(no100.size == 1, spans)
    assert(no100.head._5 >= 51L && no100.head._5 <= 55L, no100)
    assert(no100.head._6 >= 106L && no100.head._6 <= 110L, no100)
    // new_new: pair (100, 101) reports BOTH batch sides
    val nn = spans.filter(_._3 == "new_new")
    assert(nn.map(_._4).toSet === Set(100L, 101L), spans)
    // nothing pairs with the passage-free docs
    assert(!spans.exists(s => s._2 == 2L || s._1 == 101L && s._2 == 2L))
  }

  test("overlapSpansAgainst equals the one-shot report, reoriented (fuzz)") {
    // incremental-vs-one-shot equivalence on a random corpus: splitting
    // the docs into store + batch must reproduce overlapSpans(all) for
    // every pair touching the batch — new_new rows verbatim, new_old
    // rows restricted to the batch side and reoriented batch-first
    val r = new scala.util.Random(777)
    val passages = (0 until 4).map(i => words(new scala.util.Random(100 + i), 50))
    val docs = (1L to 24L).map { id =>
      val base = words(r, 60 + r.nextInt(120))
      val text = if (r.nextDouble() < 0.6) {
        val toks = base.split(" ")
        val cut = r.nextInt(toks.length)
        (toks.take(cut) :+ passages(r.nextInt(passages.length)))
          .++(toks.drop(cut)).mkString(" ")
      } else base
      (id, text)
    }
    val all = docs.toDF("doc_id", "text")
    val isNew = (id: Long) => id % 3 == 0
    val dir = java.nio.file.Files.createTempDirectory("winfuzz").toString
    Winnow.write(all.where(col("doc_id") % 3 =!= 0), "doc_id", "text", dir)
    val inc = Winnow.overlapSpansAgainst(Winnow.open(spark, dir),
        all.where(col("doc_id") % 3 === 0), "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toSet
    val expected = Winnow.overlapSpans(all, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
      .flatMap { case (a, b, doc, s0, e0, n) =>
        (isNew(a), isNew(b)) match {
          case (true, true) => Some((a, b, "new_new", doc, s0, e0, n))
          case (true, false) if doc == a => Some((a, b, "new_old", doc, s0, e0, n))
          case (false, true) if doc == b => Some((b, a, "new_old", doc, s0, e0, n))
          case _ => None
        }
      }.toSet
    assert(expected.nonEmpty, "fuzz corpus produced no overlapping pairs")
    assert(expected.exists(_._3 == "new_old") &&
      expected.exists(_._3 == "new_new"), expected)
    assert(inc === expected)
  }

  test("truncationReport flags docs past the 2^20-gram position budget") {
    val big = (1 to (1 << 20) + 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big), (2L, words(new scala.util.Random(3), 500)))
      .toDF("doc_id", "text")
    val rep = Winnow.truncationReport(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(rep(1L)._2, s"megatoken doc must be flagged: $rep")
    assert(rep(1L)._1 === ((1L << 20) + 100L - 3L))
    assert(!rep(2L)._2)
    // and fingerprints really does stop at the budget — the tail is
    // dropped, not wrapped into colliding positions
    val mx = Winnow.fingerprints(docs.where(col("doc_id") === 1L),
        "doc_id", "text").agg(max("pos"), count(lit(1))).head()
    assert(mx.getLong(0) <= (1L << 20) - 1L)
    assert(mx.getLong(1) > 0L)
  }

  test("store: write/append/replay/compact answers like the one-shot path") {
    val r = new scala.util.Random(23)
    val passage = words(new scala.util.Random(41), 60)
    val old = Seq(
      (1L, words(r, 120) + " " + passage),
      (2L, words(r, 150)),
      (3L, passage + " " + words(r, 80))
    ).toDF("doc_id", "text")
    val day1 = Seq((10L, words(r, 90) + " " + passage)).toDF("doc_id", "text")
    val batch = Seq(
      (100L, passage + " " + words(r, 70)),
      (101L, words(r, 130))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winstore").toString
    val dest = java.nio.file.Files.createTempDirectory("winstorec").toString
    Winnow.write(old, "doc_id", "text", dir)
    Winnow.append(day1, "doc_id", "text", dir, batchId = 1)
    // replayed append (orchestrator retry) must not duplicate rows
    Winnow.append(day1, "doc_id", "text", dir, batchId = 1)
    val storedRows = spark.read.parquet(s"$dir/fps").count()
    assert(storedRows ===
      Winnow.fingerprints(old.unionByName(day1), "doc_id", "text")
        .select("doc_id", "h").distinct().count(),
      "replayed append duplicated fingerprint rows")
    Winnow.compactTo(spark, dir, dest)
    def pairs(p: String) = Winnow.overlapAgainst(Winnow.open(spark, p),
        batch, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    val before = pairs(dir); val after = pairs(dest)
    assert(after === before, "compaction changed answers")
    // the planted passage is found against both an old and an appended doc
    assert(before.exists(p => p._1 == 100L && Set(1L, 3L, 10L)(p._2) &&
      p._3 == "new_old"))
    // params survive
    val idx = Winnow.open(spark, dest)
    assert((idx.k, idx.w) === (4, 5))
  }

  test("re-submitted ids are compared as new, never against themselves") {
    val r = new scala.util.Random(31)
    val passage = words(new scala.util.Random(8), 60)
    val d1 = words(r, 100) + " " + passage
    val old = Seq((1L, d1), (2L, words(r, 120))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winresub").toString
    Winnow.write(old, "doc_id", "text", dir)
    // doc 1 re-submitted verbatim plus a genuinely overlapping new doc
    val batch = Seq((1L, d1), (50L, passage + " " + words(r, 80)))
      .toDF("doc_id", "text")
    val got = Winnow.overlapAgainst(Winnow.open(spark, dir), batch,
        "doc_id", "text", minShared = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(!got.exists(p => p._1 == p._2), s"self-pair emitted: $got")
    // the real overlap is still found — as new_new (both in the batch)
    assert(got.exists(p => Set(p._1, p._2) == Set(1L, 50L)),
      s"overlap between re-submitted and new doc missing: $got")
  }

  test("re-submission shorter than a gram still evicts the stored copy") {
    // a doc redacted below k+w-1 tokens emits NO fingerprints — the
    // exclusion must key on submitted ids, not fingerprinted ids, or the
    // stale stored fingerprints keep accusing other batch docs
    val r = new scala.util.Random(77)
    val passage = words(new scala.util.Random(5), 60)
    val old = Seq((1L, words(r, 50) + " " + passage), (2L, words(r, 90)))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winshort").toString
    Winnow.write(old, "doc_id", "text", dir)
    // doc 1 redacted to 3 tokens; doc 60 shares the passage with doc 1's
    // STALE stored copy only
    val batch = Seq((1L, "a b c"), (60L, passage + " " + words(r, 40)))
      .toDF("doc_id", "text")
    val idx = Winnow.open(spark, dir)
    val pairs = Winnow.overlapAgainst(idx, batch, "doc_id", "text",
        minShared = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(!pairs.contains((60L, 1L)),
      s"stale store copy of the redacted doc still reported: $pairs")
    val spans = Winnow.overlapSpansAgainst(idx, batch, "doc_id", "text",
        minShared = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(!spans.contains((60L, 1L)),
      s"stale store copy in the span report: $spans")
  }

  test("deterministic under repartition") {
    val r = new scala.util.Random(13)
    val docs = (1 to 10).map(i => (i.toLong, words(r, 200)))
      .toDF("doc_id", "text")
    val a = Winnow.fingerprints(docs, "doc_id", "text")
      .orderBy("doc_id", "pos").collect().toSeq
    val b = Winnow.fingerprints(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id", "pos").collect().toSeq
    assert(a == b)
  }
}
