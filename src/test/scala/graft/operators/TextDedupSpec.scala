package graft.operators

import graft.SparkSpec

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  // Near-dup corpus: docs 1/2 near-identical, 3/4 near-identical, others random-ish.
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3L, "spark engines shuffle data across the cluster with hash partitioning by key"),
    (4L, "spark engines shuffle data across the cluster with hash partitioning by keys"),
    (5L, "completely unrelated text about cooking pasta with tomato sauce and basil"),
    (6L, "another different document mentioning databases indexes and storage layouts"),
    (7L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per identical text") {
    val out = TextDedup.exact(docs, "doc_id", "text")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 3L, 4L, 5L, 6L)) // 7 deduped into 1
  }

  test("minhash LSH + jaccard verification finds planted near-dups") {
    val pairs = TextDedup.minHashNearDup(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 7L))) // high-sim cluster found
    assert(pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(5L, 6L)))
  }

  test("q85 banding: tuned-band LSH recall measured against exact pairs on sf0.001") {
    // Independent recall gate for the q85 composition: the oracle there
    // mirrors candidate generation, so it cannot see pairs LSH loses. Here
    // the ground truth is the EXACT all-pairs Jaccard (inverted-index
    // jaccardPairs, no LSH), on the real sf0.001 documents table.
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val exact = TextDedup.jaccardPairs(docs, "doc_id", "text",
      shingleN = 4, threshold = 0.05)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val (_, rpb) = TextDedup.tuneBands(0.05, 16)
    val lsh = TextDedup.minHashNearDup(docs, "doc_id", "text",
      shingleN = 4, numHashes = 16, rowsPerBand = rpb, threshold = 0.05)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verify stage enforces exact Jaccard, so LSH output must be a subset
    assert(lsh.subsetOf(exact.keySet),
      s"LSH emitted pairs below threshold: ${lsh.diff(exact.keySet).take(5)}")
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      // 16 single-hash bands: collision prob 1-(1-J)^16 ≈ 0.56 at J=0.05,
      // rising steeply; overall recall depends on the similarity mix, so
      // the floor is conservative. The old 4×4 banding (midpoint J≈0.71)
      // would score near zero here on a low-similarity corpus.
      assert(recall >= 0.5, s"recall $recall over ${exact.size} exact pairs")
      val high = exact.filter(_._2 >= 0.25).keySet
      if (high.nonEmpty) {
        val highRecall = high.count(lsh.contains).toDouble / high.size
        assert(highRecall >= 0.9,
          s"high-similarity (J>=0.25) recall $highRecall over ${high.size} pairs")
      }
    }
  }

  test("jaccardVerify pruneToCandidates is result-identical to the full-corpus path") {
    val cands = TextDedup.minHashCandidates(docs, "doc_id", "text", shingleN = 3,
      numHashes = 16, rowsPerBand = 4)
    def run(prune: Boolean) =
      TextDedup.jaccardVerify(cands, docs, "doc_id", "text", shingleN = 3,
        threshold = 0.5, pruneToCandidates = prune)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    assert(run(true) === run(false) && run(false).nonEmpty)
  }

  test("exact jaccard pairs agree with hand-computed similarity") {
    val out = TextDedup.jaccardPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    // doc1 vs doc7 identical -> jaccard 1.0
    assert(out((1L, 7L)) === 1.0)
    // doc1 vs doc2: 14 tokens -> 12 shingles each, 11 shared -> 11/13
    assert(math.abs(out((1L, 2L)) - 11.0 / 13.0) < 1e-6)
  }

  test("simhash near-dup candidates include planted pairs") {
    // SimHash detects edits that are tiny relative to document length; build
    // 400-token texts with one token changed (hamming stays near 0).
    val base = (1 to 400).map(i => s"tok$i").mkString(" ")
    val longDocs = Seq(
      (1L, base), (2L, base.replace("tok17 ", "tok17x ")), (3L, base),
      (4L, (1001 to 1400).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = TextDedup.simHashNearDup(longDocs, "doc_id", "text", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L))) // identical -> hamming 0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("LSH bucket cap drops degenerate mega-buckets instead of exploding") {
    val degenerate = (1L to 50L).map(i => (i, "same same same same same same")).toDF("doc_id", "text")
    val pairs = TextDedup.minHashCandidates(degenerate, "doc_id", "text",
      shingleN = 3, numHashes = 16, rowsPerBand = 4, maxBucketSize = 10)
    assert(pairs.count() === 0) // all buckets exceed the cap
  }

  test("segment dedup keeps the globally first occurrence and rebuilds docs") {
    val docs = Seq(
      (1L, "a b c d e f"),  // both segments first-seen
      (2L, "a b c x y z"),  // "a b c" already seen in doc 1 -> dropped
      (3L, "a b c d e f"),  // fully duplicate -> doc disappears
      (4L, "d e f"),        // single segment already seen -> disappears
      (5L, "")              // empty -> dropped up front
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupSegments(docs, "doc_id", "text", segN = 3)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L, "a b c d e f"), (2L, 1L, "x y z")))
  }

  test("segment dedup truncates the trailing partial segment correctly") {
    val docs = Seq((1L, "p q r s t")).toDF("doc_id", "text") // segs: "p q r", "s t"
    val out = TextDedup.dedupSegments(docs, "doc_id", "text", segN = 3)
      .as[(Long, Long, String)].collect()
    assert(out.toSeq === Seq((1L, 2L, "p q r s t")))
  }

  test("normalized fingerprint distinguishes non-Latin documents") {
    // an ASCII-only [^a-z0-9] class strips every character of these docs,
    // fingerprints all of them as md5("") and a dedup would keep ONE
    val docs = Seq((1L, "你好 世界"), (2L, "机器 学习"), (3L, "Привет мир"),
      (4L, "你好 世界")).toDF("doc_id", "text")
    val kept = TextDedup.exact(docs, "doc_id", "text", normalized = true)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L),
      s"distinct non-Latin docs collapsed by the fingerprint: $kept")
  }

  test("segment dedup preserves the surviving text's case") {
    val docs = Seq(
      (1L, "The President said NATO will act"),
      (2L, "the president said nato plans differ")).toDF("doc_id", "text")
    val out = TextDedup.dedupSegments(docs, "doc_id", "text", segN = 3)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // doc 2's first segment dups doc 1's (case-insensitive match) and is
    // cut; the KEPT text must carry each doc's original case — before the
    // fix doc 1 came back fully lowercased
    assert(out.toSeq === Seq((1L, 2L, "The President said NATO will act"),
      (2L, 1L, "nato plans differ")), out.toSeq)
  }

  test("tuneBands picks the factorization whose S-curve inflection is nearest") {
    // 16 hashes: inflections (b,r) -> (1/b)^(1/r): (16,1)=.0625, (8,2)=.354,
    // (4,4)=.707, (2,8)=.917, (1,16)=1.0
    assert(TextDedup.tuneBands(0.05, 16) === (16, 1))
    assert(TextDedup.tuneBands(0.3, 16) === (8, 2))
    assert(TextDedup.tuneBands(0.7, 16) === (4, 4))
    assert(TextDedup.tuneBands(0.9, 16) === (2, 8))
    // the repo default (b=4, r=4) is the right choice near 0.7 — documents
    // the implicit threshold the defaults encode
    assert(TextDedup.tuneBands(0.65, 16) === (4, 4))
    intercept[IllegalArgumentException](TextDedup.tuneBands(0.0, 16))
  }

  test("crossStrataPairs folds the exact pair table into a source matrix") {
    import org.apache.spark.sql.functions.col
    val sourced = docs.withColumn("source",
      org.apache.spark.sql.functions.when(col("doc_id").isin(1L, 3L, 4L), "A")
        .otherwise("B"))
    val pairSet = TextDedup.jaccardPairs(sourced, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    // planted structure: 1~2, 1~7, 2~7 (near/exact cluster), 3~4
    assert(pairSet.map(p => (p._1, p._2)).toSet ===
      Set((1L, 2L), (1L, 7L), (2L, 7L), (3L, 4L)))
    val m = TextDedup.crossStrataPairs(sourced, "doc_id", "text", "source",
        shingleN = 3, threshold = 0.5)
      .select("src_a", "src_b", "n_pairs", "mean_jaccard")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // sources: 1,3,4 -> A; 2,5,6,7 -> B. So (1,2)->AB (1,7)->AB (2,7)->BB (3,4)->AA
    assert(m.keySet === Set(("A", "A"), ("A", "B"), ("B", "B")))
    assert(m(("A", "A"))._1 === 1L && m(("B", "B"))._1 === 1L)
    assert(m(("A", "B"))._1 === 2L)
    // matrix means are consistent with the exact pair table
    val ab = pairSet.filter(p => Set(p._1, p._2) != Set(3L, 4L) &&
      Set(p._1, p._2) != Set(2L, 7L)).map(_._3)
    assert(math.abs(m(("A", "B"))._2 - ab.sum / ab.length) < 1e-6)
  }
}
