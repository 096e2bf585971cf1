package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  // near-dup families: docs 1/2 and 101/102 are light edits of each other;
  // doc 50 is in the "old" corpus and near-dups new doc 100
  private def mk(id: Long, text: String) = (id, text)
  private def corpus = Seq(
    mk(1, "the quick brown fox jumps over the lazy dog again and again today"),
    mk(2, "the quick brown fox jumps over the lazy dog again and again tonight"),
    mk(3, "completely different content about distributed query engines"),
    mk(50, "rain in spain falls mainly on the plain every single autumn day"),
    mk(4, "yet another unrelated document mentioning shuffles and partitions")
  ).toDF("doc_id", "text")

  // 100 is a light edit of old doc 50; 101/102 are exact dups of each other
  // (every band collides — deterministic, unlike a one-word edit whose
  // collision odds depend on which shingles win the min)
  private def batch = Seq(
    mk(100, "rain in spain falls mainly on the plain every single autumn night"),
    mk(101, "novel content that resembles nothing in the standing corpus at all"),
    mk(102, "novel content that resembles nothing in the standing corpus at all")
  ).toDF("doc_id", "text")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
    df.select("id_a", "id_b", "kind").as[(Long, Long, String)].collect().toSet

  test("releaseCache drops only its own registry entry") {
    val idx = MinHashIndex.Index(
      MinHashIndex.bands(corpus, "doc_id", "text"), 3, 16, 4)
    val other = Seq(mk(300, "an entirely separate batch with its own cached band rows"))
      .toDF("doc_id", "text")
    MinHashIndex.candidates(idx, batch, "doc_id", "text").count()
    MinHashIndex.candidates(idx, other, "doc_id", "text").count()
    val before = MinHashIndex.bandCacheCount
    MinHashIndex.releaseCache(batch, "doc_id", "text", 3, 16, 4)
    assert(MinHashIndex.bandCacheCount === before - 1,
      "keyed release must drop exactly its own entry")
    // the other batch's entry still serves
    MinHashIndex.candidates(idx, other, "doc_id", "text").count()
    assert(MinHashIndex.bandCacheCount === before - 1)
    MinHashIndex.releaseCaches()
  }

  test("band-cache registry is LRU-bounded for direct candidates() callers") {
    MinHashIndex.releaseCaches()
    val idx = MinHashIndex.Index(
      MinHashIndex.bands(corpus, "doc_id", "text"), 3, 16, 4)
    // six distinct batches, none released — a direct caller that never
    // calls releaseCache must not pin unbounded persisted state
    (0 until 6).foreach { i =>
      val b = Seq(mk(500L + i, s"distinct batch number $i with its very own band rows here"))
        .toDF("doc_id", "text")
      MinHashIndex.candidates(idx, b, "doc_id", "text").count()
    }
    assert(MinHashIndex.bandCacheCount <= 4,
      s"registry must evict past its cap, holds ${MinHashIndex.bandCacheCount}")
    MinHashIndex.releaseCaches()
  }

  test("incremental candidates equal the one-shot path restricted to new docs") {
    val idx = MinHashIndex.Index(
      MinHashIndex.bands(corpus, "doc_id", "text"), 3, 16, 4)
    val got = pairs(MinHashIndex.candidates(idx, batch, "doc_id", "text"))
    val newIds = Set(100L, 101L, 102L)
    val oneShot = TextDedup
      .minHashCandidates(corpus.unionByName(batch), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
      .filter(p => newIds(p._1) || newIds(p._2))
    val gotNorm = got.map { case (a, b, _) => (math.min(a, b), math.max(a, b)) }
    val oneNorm = oneShot.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(gotNorm == oneNorm)
    assert(got.exists { case (a, b, k) => a == 100L && b == 50L && k == "new_old" })
    assert(got.exists { case (a, b, k) => a == 101L && b == 102L && k == "new_new" })
  }

  test("write → open round-trips buckets and params; candidates unchanged") {
    val dir = Files.createTempDirectory("mhidx").toString
    MinHashIndex.write(corpus, "doc_id", "text", dir)
    val opened = MinHashIndex.open(spark, dir)
    assert((opened.shingleN, opened.numHashes, opened.rowsPerBand) == (3, 16, 4))
    val inMem = MinHashIndex.Index(
      MinHashIndex.bands(corpus, "doc_id", "text"), 3, 16, 4)
    assert(pairs(MinHashIndex.candidates(opened, batch, "doc_id", "text")) ==
      pairs(MinHashIndex.candidates(inMem, batch, "doc_id", "text")))
    // the store is band-partitioned so each join task reads only its slice
    assert(new java.io.File(s"$dir/buckets").listFiles()
      .exists(_.getName.startsWith("band=")))
  }

  test("append admits a batch; the next batch sees it as old") {
    val dir = Files.createTempDirectory("mhidx2").toString
    MinHashIndex.write(corpus, "doc_id", "text", dir)
    MinHashIndex.append(batch, "doc_id", "text", dir, batchId = 1)
    // a REPLAYED append (same batchId — an orchestrator retry) must
    // replace its prior attempt, not duplicate the batch's band rows
    MinHashIndex.append(batch, "doc_id", "text", dir, batchId = 1)
    val storedRows = spark.read.parquet(s"$dir/buckets").count()
    assert(storedRows ===
      MinHashIndex.bands(corpus, "doc_id", "text").count() +
        MinHashIndex.bands(batch, "doc_id", "text").count(),
      "replayed append duplicated band rows")
    val idx = MinHashIndex.open(spark, dir)
    val next = Seq(mk(200, "novel content that resembles nothing in the standing corpus at all"))
      .toDF("doc_id", "text")
    val got = pairs(MinHashIndex.candidates(idx, next, "doc_id", "text"))
    assert(got.exists { case (a, b, k) => a == 200L && Set(101L, 102L)(b) && k == "new_old" },
      s"appended docs must be findable, got $got")
  }

  test("compactTo folds batches (and cross-batch re-ingest dups) into one base") {
    val dir = Files.createTempDirectory("mhidx3").toString
    val dest = Files.createTempDirectory("mhidx3c").toString
    MinHashIndex.write(corpus, "doc_id", "text", dir)
    MinHashIndex.append(batch, "doc_id", "text", dir, batchId = 1)
    // the same doc re-ingested under a DIFFERENT batch id — compaction
    // must fold its duplicate band rows, or they double-count against the
    // degenerate-bucket cap forever
    MinHashIndex.append(batch.where(col("doc_id") === 100),
      "doc_id", "text", dir, batchId = 2)
    MinHashIndex.compactTo(spark, dir, dest)
    val compacted = MinHashIndex.open(spark, dest)
    assert((compacted.shingleN, compacted.numHashes, compacted.rowsPerBand)
      == (3, 16, 4), "params must survive compaction")
    assert(spark.read.parquet(s"$dest/buckets")
      .select("batch_id").distinct().as[Long].collect().toSeq == Seq(0L),
      "compaction re-bases everything to batch 0")
    assert(compacted.buckets.select("id", "band", "bucket").distinct().count()
      == compacted.buckets.count(), "duplicate band rows must fold")
    // query equivalence: compacted store answers what the multi-batch
    // store answers
    val next = Seq(mk(300, "novel content that resembles nothing in the standing corpus at all"))
      .toDF("doc_id", "text")
    val before = pairs(MinHashIndex.candidates(
      MinHashIndex.open(spark, dir), next, "doc_id", "text"))
    val after = pairs(MinHashIndex.candidates(compacted, next, "doc_id", "text"))
    assert(after == before)
  }

  test("combined bucket-size cap drops degenerate buckets") {
    val boiler = (0 until 30).map(i => mk(1000 + i, "identical boilerplate text repeated verbatim across documents"))
      .toDF("doc_id", "text")
    val idx = MinHashIndex.Index(
      MinHashIndex.bands(boiler, "doc_id", "text"), 3, 16, 4)
    val oneNew = Seq(mk(2000, "identical boilerplate text repeated verbatim across documents"))
      .toDF("doc_id", "text")
    val uncapped = MinHashIndex.candidates(idx, oneNew, "doc_id", "text").count()
    val capped = MinHashIndex.candidates(idx, oneNew, "doc_id", "text",
      maxBucketSize = 10).count()
    assert(uncapped == 30L)
    assert(capped == 0L, "every bucket exceeds the cap → no candidates")
  }

  test("batch bands are cached — one shingle pass feeds the four consumers") {
    MinHashIndex.releaseCaches()
    val idx = MinHashIndex.Index(
      MinHashIndex.bands(corpus, "doc_id", "text"), 3, 16, 4)
    val out = MinHashIndex.candidates(idx, batch, "doc_id", "text")
    out.count()
    assert(MinHashIndex.bandCacheCount === 1)
    // the same batch again (even under a different cap) reuses the entry
    MinHashIndex.candidates(idx, batch, "doc_id", "text", maxBucketSize = 5).count()
    assert(MinHashIndex.bandCacheCount === 1)
    // the executed plan reads the cache instead of re-hashing the batch:
    // every minhash computation left sits inside the InMemoryRelation build
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"expected cached band reads in:\n${plan.take(1500)}")
    MinHashIndex.releaseCaches()
    assert(MinHashIndex.bandCacheCount === 0)
  }
}
