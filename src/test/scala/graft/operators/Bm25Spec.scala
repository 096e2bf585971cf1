package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with a known rare term ("zebra" in doc 3 only), a common
  // term ("the" everywhere), and varied document lengths
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the brown dog sleeps"),
    (3L, "a zebra grazes on the plain"),
    (4L, "quick quick quick brown foxes"),
    (5L, "the plain is wide and the plain is dry and the plain is flat")
  ).toDF("doc_id", "text")

  private val fixedCorpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the brown dog sleeps",
    3L -> "a zebra grazes on the plain",
    4L -> "quick quick quick brown foxes",
    5L -> "the plain is wide and the plain is dry and the plain is flat")

  /** Independent reference: plain Scala BM25 over `rawCorpus`. */
  private def brute(queryTerms: Seq[String],
                    rawCorpus: Seq[(Long, String)] = fixedCorpus,
                    k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Double)] = {
    val corpus = rawCorpus
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
      .filter(_._2.nonEmpty)
    val n = corpus.size
    val avgdl = corpus.map(_._2.size).sum.toDouble / n
    val dfm = queryTerms.map(t => t -> corpus.count(_._2.contains(t))).toMap
    corpus.flatMap { case (id, ts) =>
      val dl = ts.size
      val contribs = queryTerms.flatMap { t =>
        val tf = ts.count(_ == t)
        if (tf == 0 || dfm(t) == 0) None
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          val c = idf * tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * dl / avgdl))
          Some(BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> contribs
        .map(c => BigDecimal(java.lang.Double.toString(c))).sum
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }
  }

  test("token cache is keyed by the id column too") {
    val alt = docs.withColumn("alt_id", col("doc_id") + 100L)
    val qs = Seq((10L, "quick brown dog")).toDF("q_id", "q_text")
    val first = Bm25.topK(alt, "doc_id", "text", qs, "q_id", "q_text", k = 3)
      .select("doc_id").as[Long].collect().toSet
    // same corpus plan + text column, DIFFERENT id column: must not be
    // served the first call's cached projection (which carries doc_id)
    val second = Bm25.topK(alt, "alt_id", "text", qs, "q_id", "q_text", k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(second === first.map(_ + 100L), s"$second vs $first")
    Bm25.releaseCaches()
  }

  test("topK matches an independent scalar BM25 computation") {
    val qs = Seq((10L, "brown dog"), (11L, "zebra"), (12L, "the plain"))
      .toDF("q_id", "q_text")
    val got = Bm25.topK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 5)
      .orderBy("q_id", "rank")
      .select("q_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect()
    for ((qid, terms) <- Seq(10L -> Seq("brown", "dog"), 11L -> Seq("zebra"),
        12L -> Seq("the", "plain"))) {
      val expect = brute(terms)
      val mine = got.filter(_._1 == qid).sortBy(_._4)
      assert(mine.map(_._2).toSeq == expect.map(_._1),
        s"doc order for query $qid")
      mine.zip(expect).foreach { case ((_, _, s, _), (_, es)) =>
        assert(math.abs(s - es) < 1e-9, s"score for query $qid")
      }
    }
  }

  test("rare term outranks common term; query with no hits emits no rows") {
    val qs = Seq((1L, "zebra"), (2L, "xylophone")).toDF("q_id", "q_text")
    val got = Bm25.topK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 3)
    val rows = got.collect()
    assert(rows.forall(_.getLong(0) == 1L), "no rows for the miss query")
    assert(rows.head.getLong(1) == 3L, "zebra retrieves doc 3 first")
  }

  test("k caps the result and ties break by ascending doc_id") {
    val dup = Seq((1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "same text")).toDF("doc_id", "text")
    val qs = Seq((1L, "same")).toDF("q_id", "q_text")
    val got = Bm25.topK(dup, "doc_id", "text", qs, "q_id", "q_text", k = 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(got.length == 2)
    assert(got.map(_._2).toSeq == Seq(1L, 2L), "tie order by doc_id")
    assert(got.map(_._3).distinct.length == 1, "tied scores equal")
  }

  test("property: topK matches the scalar reference on random corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "rho", "sigma")
    for (seed <- Seq(11, 29, 47)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1L to 30L).map(id =>
        id -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      val qTerms = Seq.fill(3)(vocab(rnd.nextInt(vocab.size))).distinct
      val cdf = corpus.toDF("doc_id", "text")
      val qs = Seq((1L, qTerms.mkString(" "))).toDF("q_id", "q_text")
      val got = Bm25.topK(cdf, "doc_id", "text", qs, "q_id", "q_text", k = 30)
        .orderBy("rank").select("doc_id", "score")
        .as[(Long, Double)].collect().toSeq
      val want = brute(qTerms, corpus)
      assert(got == want, s"seed $seed: got $got want $want")
    }
  }

  test("topKIndexed over buildIndex equals the ad-hoc path") {
    val qs = Seq((10L, "brown dog"), (12L, "the plain")).toDF("q_id", "q_text")
    val adhoc = Bm25.topK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 4)
      .orderBy("q_id", "rank").collect().toSeq
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    val viaIdx = Bm25.topKIndexed(idx, qs, "q_id", "q_text", k = 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(viaIdx == adhoc)
  }

  test("write → open round-trips the index; results identical") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    Bm25.write(idx, dir)
    val qs = Seq((10L, "brown dog"), (12L, "the plain")).toDF("q_id", "q_text")
    val direct = Bm25.topKIndexed(idx, qs, "q_id", "q_text", k = 4)
      .orderBy("q_id", "rank").collect().toSeq
    val viaDisk = Bm25.topKIndexed(Bm25.open(spark, dir), qs, "q_id", "q_text", k = 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(viaDisk == direct)
  }

  test("append extends a persisted index; results equal a full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("bm25app").toString
    Bm25.write(Bm25.buildIndex(
      docs.where($"doc_id" <= 3), "doc_id", "text"), dir)
    Bm25.append(docs.where($"doc_id" > 3), "doc_id", "text", dir, batchId = 1)
    // a replayed append (same batchId) must not double-count tf/df/stats
    Bm25.append(docs.where($"doc_id" > 3), "doc_id", "text", dir, batchId = 1)
    val qs = Seq((10L, "brown dog"), (11L, "quick"), (12L, "the plain"))
      .toDF("q_id", "q_text")
    val full = Bm25.topKIndexed(Bm25.buildIndex(docs, "doc_id", "text"),
        qs, "q_id", "q_text", k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    val incremental = Bm25.topKIndexed(Bm25.open(spark, dir),
        qs, "q_id", "q_text", k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    assert(incremental == full,
      "append must reproduce the full rebuild exactly (tf, df, stats)")
  }

  test("stored bucket count wins over the compiled default on open and append") {
    // a store written with a DIFFERENT bucket count than the compiled
    // default (as after any future change to postingsBuckets): open must
    // prune with the stored modulus and append must bucket with it, or
    // queries silently miss matching directories
    val dir = java.nio.file.Files.createTempDirectory("bm25bk").toString
    Bm25.write(Bm25.buildIndex(
      docs.where($"doc_id" <= 3), "doc_id", "text"), dir, buckets = 8)
    Bm25.append(docs.where($"doc_id" > 3), "doc_id", "text", dir, batchId = 1)
    val opened = Bm25.open(spark, dir)
    assert(opened.buckets === 8)
    val bucketVals = spark.read.parquet(s"$dir/postings")
      .select("__bucket").distinct().as[Long].collect()
    assert(bucketVals.forall(b => b >= 0 && b < 8),
      s"appended postings must use the stored 8-bucket layout, got $bucketVals")
    val qs = Seq((10L, "brown dog"), (11L, "quick"), (12L, "the plain"))
      .toDF("q_id", "q_text")
    val got = Bm25.topKIndexed(opened, qs, "q_id", "q_text", k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    val full = Bm25.topKIndexed(Bm25.buildIndex(docs, "doc_id", "text"),
        qs, "q_id", "q_text", k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    assert(got == full)
    // compaction preserves the stored layout contract
    val dest = java.nio.file.Files.createTempDirectory("bm25bkc").toString
    Bm25.compactTo(spark, dir, dest)
    assert(Bm25.open(spark, dest).buckets === 8)
  }

  test("compactTo folds appended postings and stats; ranking unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("bm25cmp").toString
    Bm25.write(Bm25.buildIndex(
      docs.where($"doc_id" <= 3), "doc_id", "text"), dir)
    Bm25.append(docs.where($"doc_id" > 3), "doc_id", "text", dir, batchId = 1)
    val dest = java.nio.file.Files.createTempDirectory("bm25cmpd").toString
    Bm25.compactTo(spark, dir, dest)
    val qs = Seq((10L, "brown dog"), (11L, "quick"), (12L, "the plain"))
      .toDF("q_id", "q_text")
    def ans(p: String) = Bm25.topKIndexed(Bm25.open(spark, p),
        qs, "q_id", "q_text", k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    assert(ans(dest) == ans(dir))
    // per-append stats rows folded into the single batch-0 corpus total
    assert(spark.read.parquet(s"$dest/stats").count() === 1)
    assert(new java.io.File(s"$dest/stats").listFiles()
      .map(_.getName).count(_.startsWith("batch_id=")) === 1)
  }

  test("opened-index query prunes postings directories to the query's term buckets") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val dir = java.nio.file.Files.createTempDirectory("bm25prune").toString
    Bm25.write(Bm25.buildIndex(docs, "doc_id", "text"), dir)
    val nDirs = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("__bucket="))
    assert(nDirs > 2, s"corpus terms should spread over >2 buckets, got $nDirs")
    val qs = Seq((1L, "zebra")).toDF("q_id", "q_text")
    val res = Bm25.topKIndexed(Bm25.open(spark, dir), qs, "q_id", "q_text", k = 3)
    assert(res.collect().head.getLong(1) == 3L)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(scans)
    }
    val postingScans = scans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
    assert(postingScans.nonEmpty, "expected parquet scans of the postings store")
    // one query term ⇒ one bucket directory planned, on EVERY postings scan
    postingScans.foreach { sc =>
      assert(sc.selectedPartitions.partitionCount === 1,
        s"single-term query should plan 1/$nDirs bucket dirs, " +
          s"planned ${sc.selectedPartitions.partitionCount}")
      assert(sc.partitionFilters.nonEmpty,
        "bucket isin should be a partition filter at the scan")
    }
  }

  test("topK tokenizes the corpus once — cache registry keyed by corpus") {
    Bm25.releaseCaches()
    val qs = Seq((1L, "zebra")).toDF("q_id", "q_text")
    Bm25.topK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 3).count()
    Bm25.topK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 3).count()
    assert(Bm25.tokenCacheCount === 1,
      "repeat topK over the same corpus must reuse one token cache")
    Bm25.releaseCaches()
    assert(Bm25.tokenCacheCount === 0)
  }

  test("topK re-pins the token cache after a harness-style block release") {
    Bm25.releaseCaches()
    val qs = Seq((1L, "zebra")).toDF("q_id", "q_text")
    val before = Bm25.topK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 3)
      .select("doc_id", "score").as[(Long, Double)].collect().toSet
    // simulate Bench/Verify's between-query release: every pinned block is
    // dropped but Bm25's registry entry survives with storageLevel NONE
    graft.Bench.releasePinnedBlocks(spark)
    val after = Bm25.topK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 3)
    assert(after.select("doc_id", "score").as[(Long, Double)].collect().toSet
      === before, "answers must be unchanged across the release")
    assert(Bm25.tokenCacheCount === 1)
    // the map hit must have RE-PINNED the projection, not served an
    // unpersisted frame that silently re-tokenizes per consumer
    assert(Bm25.cachedTokenStorageLevels.forall(
      _ != org.apache.spark.storage.StorageLevel.NONE),
      "token cache must be re-persisted after an external unpersist")
    Bm25.releaseCaches()
  }

  test("allowedDocs filter: global IDF, dense ranks over survivors only") {
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    val qs = Seq((1L, "brown plain")).toDF("q_id", "q_text")
    val full = Bm25.topKIndexed(idx, qs, "q_id", "q_text", k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val allowed = Seq(2L, 3L, 5L).toDF("doc_id")
    val filtered = Bm25.topKIndexed(idx, qs, "q_id", "q_text", k = 5,
        allowedDocs = Some(allowed))
      .select("doc_id", "score", "rank").as[(Long, Double, Int)].collect()
    assert(filtered.map(_._1).toSet.subsetOf(Set(2L, 3L, 5L)),
      "only allowed docs may return")
    // scores identical to the unfiltered run (IDF stays store-global)
    filtered.foreach { case (d, s, _) => assert(s === full(d), s"doc $d") }
    // ranks dense 1..n over the survivors
    assert(filtered.map(_._3).sorted.toSeq === (1 to filtered.length).toSeq)
  }

  test("corpus tokens are pruned by broadcast BEFORE any shuffle") {
    val qs = Seq((1L, "zebra")).toDF("q_id", "q_text")
    val plan = Bm25.topK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 3)
      .queryExecution.executedPlan.toString
    // the postings aggregation must sit above a broadcast join of the
    // query terms, not above a raw exchange of all corpus tokens
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
