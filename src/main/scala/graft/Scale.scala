package graft
import org.apache.spark.sql.functions._
import graft.operators._
object Scale {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val d1 = Tables.read(spark, "/root/testdata/sf0.1", "documents")
    // 16x corpus: shifted ids, text perturbed per replica to avoid trivial exact dups
    val d16 = (0 until 16).map(i =>
      d1.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))).reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    time("warmup")(d16.count())
    time("exact_1x")(TextDedup.exactGroups(d1, "doc_id", "text").count())
    time("exact_16x")(TextDedup.exactGroups(d16, "doc_id", "text").count())
    time("minhash_1x")(TextDedup.minHashCandidates(d1, "doc_id", "text").count())
    time("minhash_16x")(TextDedup.minHashCandidates(d16, "doc_id", "text").count())
    time("jaccard_1x")(TextDedup.jaccardPairs(d1, "doc_id", "text", 4, 0.01).count())
    time("jaccard_16x")(TextDedup.jaccardPairs(d16, "doc_id", "text", 4, 0.01).count())
    val e1 = Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    val e8 = (0 until 8).map(i => e1.select((col("vec_id") + lit(i * 1000000)).as("vec_id"),
      col("embedding"), col("label"))).reduce(_ union _)
    time("neardup_1x")(Knn.cosineNearDup(e1, 0.3).count())
    time("neardup_8x")(Knn.cosineNearDup(e8, 0.3).count())
    // temporal operators: replicate events 16x across disjoint users — asof
    // (window) and band join (bucket equi join) must both scale linearly
    val ev1 = Tables.read(spark, "/root/testdata/sf0.1", "events")
    val ev16 = (0 until 16).map(i =>
      ev1.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * 100000L)).as("user_id"),
        col("event_type"), col("value"))).reduce(_ union _)
    def asofCount(ev: org.apache.spark.sql.DataFrame): Long = {
      val l = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("lts"))
      val r = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("rts")).agg(max("value").as("v"))
      AsOfJoin.latestPrior(l, r, Seq("user_id"), "lts", "rts").count()
    }
    def bandCount(ev: org.apache.spark.sql.DataFrame): Long = {
      val a = ev.where(col("event_type") === "click")
        .select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
      val b = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("b_id"), col("user_id"), col("ts").as("b_ts"))
      BandJoin.within(a, b, Seq("user_id"), "a_ts", "b_ts", 3600L * 1000000000L).count()
    }
    time("asof_1x")(asofCount(ev1))
    time("asof_16x")(asofCount(ev16))
    time("band_1x")(bandCount(ev1))
    time("band_16x")(bandCount(ev16))
    // --- round-7 probes: the wide operators added since round 4 ---
    // decontamination: bench side fixed (eval suites don't grow with the
    // corpus), training side 16x — time must track the training side
    val bench = d1.where(col("doc_id") % 50 === 0).select(col("doc_id"), col("text"))
    time("decontam_1x")(Decontaminate.overlap(d1, bench, "doc_id", "text").count())
    time("decontam_16x")(Decontaminate.overlap(d16, bench, "doc_id", "text").count())
    Decontaminate.releaseCaches()
    time("segdedup_1x")(TextDedup.dedupSegments(d1, "doc_id", "text").count())
    time("segdedup_16x")(TextDedup.dedupSegments(d16, "doc_id", "text").count())
    // bloom-pruned anti join: tombstone side fixed, big side grows
    val tombs = d1.select(col("doc_id")).where(col("doc_id") % 10 === 0)
    time("bloomanti_1x")(BloomPrune.prunedAntiJoin(d1, tombs, Seq("doc_id")).count())
    time("bloomanti_16x")(BloomPrune.prunedAntiJoin(d16, tombs, Seq("doc_id")).count())
    // CMS sketch build + merge over events (two-level re-aggregation shape)
    def cmsCount(ev: org.apache.spark.sql.DataFrame): Long = {
      val daily = ev.groupBy(expr("to_date(timestamp_micros(ts DIV 1000))").as("d"))
        .agg(call_function("graft_cms_sketch", col("user_id"), lit(5), lit(4096)).as("sk"))
      daily.agg(call_function("graft_cms_merge", col("sk")).as("sk")).count()
    }
    graft.GraftFunctions.register(spark)
    time("cms_merge_1x")(cmsCount(ev1))
    time("cms_merge_16x")(cmsCount(ev16))
    def bloomCount(ev: org.apache.spark.sql.DataFrame): Long =
      ev.agg(call_function("graft_bloom_agg", col("user_id"),
        lit(1 << 23), lit(5)).as("b")).count()
    time("bloom_agg_1x")(bloomCount(ev1))
    time("bloom_agg_16x")(bloomCount(ev16))
    // token packing: range-sliced windows must parallelize past #strata
    val p1 = d1.select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("w"))
    val p16 = (0 until 16).map(i => p1.select(
      (col("doc_id") + lit(i * 1000000)).as("doc_id"), col("lang"), col("w")))
      .reduce(_ union _)
    time("pack_1x")(Pack.tokenWindows(p1, "lang", "doc_id", "w", 4096L).count())
    time("pack_16x")(Pack.tokenWindows(p16, "lang", "doc_id", "w", 4096L).count())
    // IVF query: index built per corpus OUTSIDE the timer (build cost is
    // amortized via Ivf.write/open at real scale); query time must stay
    // ~flat-per-probed-fraction as the corpus grows
    val qset = e1.where(col("vec_id") % 500 === 0)
    val idx1 = Ivf.build(e1, 16, trainSample = 10000)
    idx1.assigned.cache().count()
    time("ivf_query_1x")(Ivf.query(idx1, qset, 5, 4).count())
    val idx8 = Ivf.build(e8, 16, trainSample = 10000)
    idx8.assigned.cache().count()
    time("ivf_query_8x")(Ivf.query(idx8, qset, 5, 4).count())
    // BM25: fixed query set, corpus grows — time must track the corpus scan
    val bmq = d1.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ", slice(graft.functions.TextFunctions.tokens(col("text")), 1, 8)).as("q_text"))
    time("bm25_1x")(Bm25.topK(d1, "doc_id", "text", bmq, "q_id", "q_text", 5).count())
    time("bm25_16x")(Bm25.topK(d16, "doc_id", "text", bmq, "q_id", "q_text", 5).count())
    Bm25.releaseCaches()
    // DSIR: fixed target corpus, raw side grows
    val tgt = d1.where(col("doc_id") % 50 === 0)
    time("dsir_1x")(Importance.weights(d1, tgt, "doc_id", "text").count())
    time("dsir_16x")(Importance.weights(d16, tgt, "doc_id", "text").count())
    // incremental near-dup: fixed new batch, standing index grows —
    // index bands pre-materialized (parquet at real scale)
    val mhb = d1.where(col("doc_id") % 20 === 0)
    val mh1 = MinHashIndex.bands(d1.where(col("doc_id") % 20 =!= 0), "doc_id", "text")
    mh1.cache().count()
    time("mhidx_1x")(MinHashIndex.candidates(
      MinHashIndex.Index(mh1, 3, 16, 4), mhb, "doc_id", "text").count())
    val mh16 = MinHashIndex.bands(d16.where(col("doc_id") % 20 =!= 0), "doc_id", "text")
    mh16.cache().count()
    time("mhidx_16x")(MinHashIndex.candidates(
      MinHashIndex.Index(mh16, 3, 16, 4), mhb, "doc_id", "text").count())
    // PQ ADC search: fixed queries, code corpus grows — codes precomputed
    // (the persisted-index shape), scan cost should track the 8-byte codes
    val pqcb = Pq.train(e1, m = 8, kc = 16, trainSample = 10000)
    val pqc1 = Pq.encode(e1, pqcb); pqc1.cache().count()
    val pqc8 = Pq.encode(e8, pqcb); pqc8.cache().count()
    time("pq_search_1x")(Pq.search(pqcb, pqc1, qset, 5).count())
    time("pq_search_8x")(Pq.search(pqcb, pqc8, qset, 5).count())
    // IVF-PQ: both prunings compose — query cost should stay ~flat
    val ipq1 = IvfPq.build(e1, 16, trainSample = 10000)
    ipq1.coded.cache().count()
    time("ivfpq_query_1x")(IvfPq.query(ipq1, qset, 5, 4).count())
    val ipq8 = IvfPq.build(e8, 16, trainSample = 10000)
    ipq8.coded.cache().count()
    time("ivfpq_query_8x")(IvfPq.query(ipq8, qset, 5, 4).count())
    // --- round-8 probes ---
    persistedIndexProbes(spark, e1, idx1, idx8, qset, time)
    spark.stop()
  }

  /** The persisted-index probe section (append cost vs standing size, the
    * pruned open→query read path, fragmentation after a season of appends,
    * and the compaction payoff). Shared by [[main]] and the standalone
    * [[ScaleIdx]] runner so these can be re-measured without the full rig.
    */
  def persistedIndexProbes(spark: org.apache.spark.sql.SparkSession,
      e1: org.apache.spark.sql.DataFrame, idx1: Ivf.Index, idx8: Ivf.Index,
      qset: org.apache.spark.sql.DataFrame,
      time: String => (=> Long) => Unit): Unit = {
    // persisted-index APPEND: a fixed daily batch against a 1x vs 8x
    // standing index — cost must track the BATCH (append reads only the
    // tiny centroid table, never the stored cells)
    val ivfDir1 = java.nio.file.Files.createTempDirectory("scale_ivf1_").toString
    val ivfDir8 = java.nio.file.Files.createTempDirectory("scale_ivf8_").toString
    Ivf.write(idx1, ivfDir1)
    Ivf.write(idx8, ivfDir8)
    val abatch = e1.where(col("vec_id") % 100 === 0)
      .select((col("vec_id") + lit(90000000L)).as("vec_id"), col("embedding"))
    time("ivf_append_1x") { Ivf.append(abatch, ivfDir1, batchId = 1); abatch.count() }
    time("ivf_append_8x") { Ivf.append(abatch, ivfDir8, batchId = 1); abatch.count() }
    // persisted-index READ path (open → probe → PRUNED scan, the q84
    // shape): per-query cost must stay ~flat as the stored corpus grows,
    // because file listing only touches the probed cell directories
    time("ivf_open_query_1x")(Ivf.query(Ivf.open(spark, ivfDir1), qset, 5, 4).count())
    time("ivf_open_query_8x")(Ivf.query(Ivf.open(spark, ivfDir8), qset, 5, 4).count())
    // COMPACTION: a season of daily appends leaves one file layer per
    // (cell, batch); compactTo collapses the store back to one file per
    // cell — the open→query time should drop back toward the
    // freshly-written index's
    for (b <- 2 to 16)
      Ivf.append(abatch.select((col("vec_id") + lit(b)).as("vec_id"),
        col("embedding")), ivfDir1, batchId = b)
    time("ivf_open_query_fragmented")(
      Ivf.query(Ivf.open(spark, ivfDir1), qset, 5, 4).count())
    val ivfDirC = java.nio.file.Files.createTempDirectory("scale_ivfc_").toString
    time("ivf_compact") { Ivf.compactTo(spark, ivfDir1, ivfDirC); 0L }
    time("ivf_open_query_compacted")(
      Ivf.query(Ivf.open(spark, ivfDirC), qset, 5, 4).count())
  }
}

/** Scaling probes for the round-8 learned-model operators ("big data,
  * small model" shapes — DESIGN.md §18): scoring/projection cost must
  * track the corpus linearly while the model side stays constant, and
  * fit/train cost must track its own input, not the scoring corpus.
  */
object ScaleQual {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val d1 = Tables.read(spark, "/root/testdata/sf0.1", "documents")
    val d16 = (0 until 16).map(i =>
      d1.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"), col("lang")))
      .reduce(_ union _)
    time("warmup")(d16.count())
    // classifier: train ONCE on the 1x corpus (labels = injected marker
    // parity, the q89 task), then score 1x vs 16x — scoring is the
    // 100 TB path and must be linear in the corpus
    val labeled = d1.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, concat(col("text"), lit(" crisp coherent prose")))
        .otherwise(concat(col("text"), lit(" zzjunk zzspam zzgarble"))).as("text"),
      (col("doc_id") % 2 === 0).cast("int").as("label"))
    val qcm = graft.quality.QualityClassifier.train(
      labeled, "doc_id", "text", "label", nBuckets = 4096, iters = 20, lr = 1.0)
    time("qc_score_1x")(graft.quality.QualityClassifier
      .score(d1, "doc_id", "text", qcm).count())
    time("qc_score_16x")(graft.quality.QualityClassifier
      .score(d16, "doc_id", "text", qcm).count())
    // bigram LM: train once on the English 1x subset, score 1x vs 16x
    val lm = graft.quality.NgramLm.train(
      d1.where(col("lang") === "en"), "doc_id", "text")
    time("lm_score_1x")(graft.quality.NgramLm
      .scoreAvgLogProb(d1, "doc_id", "text", lm).count())
    time("lm_score_16x")(graft.quality.NgramLm
      .scoreAvgLogProb(d16, "doc_id", "text", lm).count())
    graft.quality.NgramLm.releaseCaches()
    // PCA: fit is one pass over its own input; project is narrow
    val e1 = Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    val e8 = (0 until 8).map(i => e1.select(
      (col("vec_id") + lit(i * 1000000)).as("vec_id"),
      col("embedding"), col("label"))).reduce(_ union _)
    var pm: Pca.Model = null
    time("pca_fit_1x") { pm = Pca.fit(e1, "embedding", 8); 1L }
    time("pca_fit_8x") { Pca.fit(e8, "embedding", 8); 1L }
    time("pca_project_1x")(Pca.project(e1, "vec_id", "embedding", pm).count())
    time("pca_project_8x")(Pca.project(e8, "vec_id", "embedding", pm).count())
    // SemDeDup: cluster-scoped pair search — sum(c_i^2) grows with the
    // corpus, k-means cost with the bounded train sample only
    time("semdedup_prune_1x")(SemDedup.prune(e1, nClusters = 16, tau = 0.95,
      trainSample = 10000).count())
    time("semdedup_prune_8x")(SemDedup.prune(e8, nClusters = 16, tau = 0.95,
      trainSample = 10000).count())
    spark.stop()
  }
}

/** Standalone runner for just the persisted-index probes — builds the 1x
  * and 8x in-memory indexes it needs and skips the rest of the rig.
  */
object ScaleIdx {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val e1 = Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    val e8 = (0 until 8).map(i => e1.select(
      (col("vec_id") + lit(i * 1000000)).as("vec_id"),
      col("embedding"), col("label"))).reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val qset = e1.where(col("vec_id") % 500 === 0)
    val idx1 = Ivf.build(e1, 16, trainSample = 10000)
    idx1.assigned.cache().count()
    val idx8 = Ivf.build(e8, 16, trainSample = 10000)
    idx8.assigned.cache().count()
    Scale.persistedIndexProbes(spark, e1, idx1, idx8, qset, time)
    spark.stop()
  }
}

/** Round-12 probe: the payload-partitioned store lever (DESIGN note 30).
  * Claim under test: lifting a dominant filter attribute into the
  * directory layout turns the filter into FILE-LISTING pruning — the scan
  * plans only the matching label's leaf directories — where the row-level
  * payload store plans every probed cell's files and filters inside them.
  * Reported per store: query wall time AND the planned scan BYTES (the
  * number that scales: both stores prune to the probed cells' leaves, but
  * the partitioned store's surviving leaves hold only the matching
  * label's rows — at 1/10 selectivity ~1/10 of the bytes ever enter the
  * plan, invariant of corpus size).
  */
object ScaleFilt {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val e1 = Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    val e8 = (0 until 8).map(i => e1.select(
      (col("vec_id") + lit(i * 1000000)).as("vec_id"),
      col("embedding"), col("label"))).reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    def plannedBytes(df: org.apache.spark.sql.DataFrame): Long = {
      df.count()
      graft.util.PlanScans.fileScansOf(df, "cells")
        .map(_.selectedPartitions.totalFileSize).max
    }
    val root = java.nio.file.Files.createTempDirectory("scale_filt").toString
    for ((tag, df) <- Seq("1x" -> e1, "8x" -> e8)) {
      val idx = operators.Ivf.build(df, 16, trainSample = 10000,
        payload = Seq("label"))
      operators.Ivf.write(idx, s"$root/$tag/row")
      operators.Ivf.write(idx, s"$root/$tag/part",
        partitionPayload = Seq("label"))
      val qs = df.where(col("vec_id") % 500 === 0)
      for (kind <- Seq("row", "part")) {
        val op = operators.Ivf.open(spark, s"$root/$tag/$kind")
        def q() = operators.Ivf.query(op, qs, k = 10, nProbe = 4,
          filter = Some(col("label") === 3))
        time(s"filt_${kind}_$tag")(q().count())
        println(s"SCALE filt_${kind}_$tag planned_bytes=${plannedBytes(q())}")
      }
    }
    spark.stop()
  }
}

/** Round-11 probes: the CCNet bucketing pair (window-exact vs
  * KLL-threshold) and the contamination report. The claim under test:
  * `exact`'s per-language window concentrates each language into ONE task,
  * so at a fixed language count its runtime is bound by the largest
  * language; `approx` is two corpus-wide aggregations and must track the
  * corpus linearly with flat parallelism. Report must track the training
  * side (the bench side is fixed — eval suites don't grow with corpora).
  */
object ScaleCcnet {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val d1 = Tables.read(spark, "/root/testdata/sf0.1", "documents")
    val d16 = (0 until 16).map(i =>
      d1.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        col("lang"), concat(col("text"), lit(s" replica$i")).as("text")))
      .reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    time("warmup")(d16.count())
    val lm = graft.quality.NgramLm.train(
      d1.where(col("lang") === "en"), "doc_id", "text")
    def scored(d: org.apache.spark.sql.DataFrame) =
      graft.quality.NgramLm.scoreAvgLogProb(d, "doc_id", "text", lm)
        .join(d.select("doc_id", "lang"), "doc_id")
    val s1 = scored(d1).cache(); s1.count()
    val s16 = scored(d16).cache(); s16.count()
    // deliberate measurement of the exact path at 16x — lift the loud
    // partition-cap guard for it
    time("ccnet_exact_1x")(graft.quality.CcnetBuckets
      .exact(s1, "lang", "avg_logp", "doc_id", maxParts = Int.MaxValue).count())
    time("ccnet_exact_16x")(graft.quality.CcnetBuckets
      .exact(s16, "lang", "avg_logp", "doc_id", maxParts = Int.MaxValue).count())
    time("ccnet_approx_1x")(graft.quality.CcnetBuckets
      .approx(s1, "lang", "avg_logp").count())
    time("ccnet_approx_16x")(graft.quality.CcnetBuckets
      .approx(s16, "lang", "avg_logp").count())
    s1.unpersist(); s16.unpersist()
    // the scored caches above are the last readers of the LM's counted table
    graft.quality.NgramLm.releaseCaches()
    val bench = d1.where(col("doc_id") % 50 === 0).select(col("doc_id"), col("text"))
    time("contam_report_1x")(operators.Decontaminate
      .report(d1, bench, "doc_id", "text").count())
    time("contam_report_16x")(operators.Decontaminate
      .report(d16, bench, "doc_id", "text").count())
    operators.Decontaminate.releaseCaches()
    spark.stop()
  }
}

/** Round-12 probe: SubstringDedup's claim that shuffling 64-bit gram
  * hashes instead of gram strings is the difference that matters at scale.
  * Both variants run the identical pipeline (windows → per-gram distinct-doc
  * count → semi-join back → coverage); only the shuffle key changes. A
  * task-metrics listener totals actual shuffle-write bytes per run.
  */
object ScaleSubstr {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val d1 = Tables.read(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    // replicas get distinct suffixes so the natural duplicate rate is kept
    // instead of making every window an 8-way duplicate
    val d8 = (0 until 8).map(i =>
      d1.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))).reduce(_ union _)
    // listener events drain asynchronously (the bus is private[spark]) —
    // poll the counter until it has been stable for 500 ms
    def settle(): Long = {
      var prev = -1L; var cur = shuffleBytes.get; var waited = 0
      while (cur != prev && waited < 20000) {
        prev = cur; Thread.sleep(500); waited += 500; cur = shuffleBytes.get
      }
      cur
    }
    def run(name: String)(f: => Long): Unit = {
      settle(); shuffleBytes.set(0L)
      val t0 = System.nanoTime(); val n = f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SCALE $name rows=$n%d t=$t%.2f shuffle_mb=${settle() / 1e6}%.1f")
    }
    run("warmup")(d8.count())
    // two rounds: round 0 absorbs codegen/JIT, read round 1
    for (round <- 0 to 1; (tag, d) <- Seq("1x" -> d1, "8x" -> d8);
         hashed <- Seq(true, false))
      run(s"substr_${if (hashed) "hash" else "string"}_${tag}_r$round")(
        ScaleConsume(operators.SubstringDedup
          .report(d, "doc_id", "text", k = 8, hashGrams = hashed)))
    spark.stop()
  }
}

/** Consume EVERY output column of a measured frame: a bare count() lets
  * the optimizer eliminate join trees whose columns go unreferenced (and
  * count(non-nullable) folds straight back to count(*)) — max over a
  * full-row hash defeats both prunes.
  */
private[graft] object ScaleConsume {
  def apply(df: org.apache.spark.sql.DataFrame): Long =
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("__x"))
      .agg(max("__x")).head.getLong(0)
}

/** Round-12 probe #2: the incremental gram-index claim — a daily
  * increment's substring report against a persisted store must cost like
  * the INCREMENT, while the full recompute pays the whole corpus every
  * run. 8x corpus, 1x-sized batch (the realistic daily ratio).
  */
object ScaleSubstrInc {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val d1 = Tables.read(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val corpus = (0 until 8).map(i =>
      d1.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))).reduce(_ union _)
    // daily:standing ~ 1:80 — a 500-doc increment against a 40k-doc store
    val batch = d1.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(9000000)).as("doc_id"),
        concat(col("text"), lit(" fresh")).as("text"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(corpus.count() + batch.count())
    val root = java.nio.file.Files.createTempDirectory("substr_inc").toString
    time("build_store_8x")({
      operators.SubstringDedup.buildIndex(corpus, "doc_id", "text", 8, root); 1L
    })
    for (round <- 0 to 1) {
      time(s"incremental_r$round")(ScaleConsume(operators.SubstringDedup
        .reportAgainst(spark, root, batch, "doc_id", "text")))
      time(s"full_recompute_r$round")(ScaleConsume(operators.SubstringDedup
        .report(corpus.union(batch), "doc_id", "text", k = 8)
        .where(col("doc_id") >= 9000000L)))
    }
    spark.stop()
  }
}

/** Round-12 probe #3: BPE training's architectural claim — the corpus is
  * paid ONCE (the word-count scan); merge rounds run over the vocab and
  * must stay ~flat as the corpus grows. 16x replicas share the 1x vocab
  * (plus 16 replica-marker words), so flat round time at 16x is exactly
  * the claim.
  */
object ScaleBpe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val d1 = Tables.read(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val d16 = (0 until 16).map(i =>
      d1.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))).reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(d16.count())
    for ((tag, d) <- Seq("1x" -> d1, "16x" -> d16)) {
      time(s"word_scan_$tag")(operators.Bpe.wordCounts(d, "text").count())
      // rounds-only timing: the scan is inside train's first step, so
      // subtract by timing 0 merges (scan + checkpoint, no rounds)
      time(s"train0_$tag")({ operators.Bpe.train(d, "text", 0); 1L })
      // hybrid default (vocab fits the driver -> local rounds) vs the
      // forced-distributed rounds a 10^8-word vocab would take: the r12
      // corpus-flat-rounds claim is about the DISTRIBUTED path, the r13
      // hybrid claim is the gap between the two at driver-sized vocabs
      time(s"train20_$tag")({ operators.Bpe.train(d, "text", 20); 1L })
      time(s"train20dist_$tag")({
        operators.Bpe.train(d, "text", 20, localVocabLimit = 0L); 1L })
    }
    spark.stop()
  }
}

/** Round-13 probe: the span-cut rebuild. The old formulation tested every
  * token against every island (`exists` inside `zip_with` — O(T x I) per
  * doc); the new one slices the gaps between sorted islands (O(T + I)).
  * Both run here as raw expressions over IDENTICAL synthetic inputs — docs
  * of `T` tokens with `I` disjoint k-islands — so the probe isolates
  * exactly the rewritten expression; island construction and text are
  * shared. A boilerplate-heavy doc (hundreds of islands) is where the old
  * path went quadratic-ish.
  */
object ScaleCut {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val k = 8
    def corpus(nDocs: Int, tokensPerDoc: Int, islands: Int) = {
      val text = concat_ws(" ", transform(
        sequence(lit(1), lit(tokensPerDoc)), i => concat(lit("w"), i)))
      // islands at stride so they stay disjoint and non-adjacent
      val stride = tokensPerDoc / math.max(islands, 1)
      val ivs = transform(sequence(lit(0), lit(islands - 1)),
        j => struct((j * stride + 1).as("__s"), (j * stride + k).as("__e")))
      spark.range(nDocs).select(col("id").as("doc_id"),
        text.as("text"), ivs.as("__ivs"))
    }
    def oldCut(toks: org.apache.spark.sql.Column) = concat_ws(" ",
      filter(zip_with(toks, sequence(lit(1), greatest(size(toks), lit(1))),
        (t, p) => when(exists(col("__ivs"),
          iv => p >= iv("__s") && p <= iv("__e")),
          lit(null).cast("string")).otherwise(t)), t => t.isNotNull))
    def newCut(toks: org.apache.spark.sql.Column) = concat_ws(" ",
      flatten(zip_with(
        concat(array(lit(1)), transform(col("__ivs"), iv => (iv("__e") + 1).cast("int"))),
        concat(transform(col("__ivs"), iv => (iv("__s") - 1).cast("int")),
          array(size(toks))),
        (gs, ge) => slice(toks, gs, greatest(ge - gs + 1, lit(0))))))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name n=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    import graft.functions.TextFunctions.tokens
    for (round <- 0 to 1; (tag, islands) <- Seq("i30" -> 30, "i240" -> 240)) {
      // __toks materialized in a prior projection exactly as production
      // cutSpans does — inlining tokens(text) into the lambda would
      // re-tokenize the doc once PER GAP and swamp the measurement
      val d = corpus(4000, 2400, islands)
        .withColumn("__toks", tokens(col("text")))
      val equal = d.select((oldCut(col("__toks")) ===
        newCut(col("__toks"))).as("eq"))
        .agg(min("eq")).head.getBoolean(0)
      require(equal, s"old/new cut disagree at $tag")
      time(s"cut_old_${tag}_r$round")(ScaleConsume(
        d.select(col("doc_id"), oldCut(col("__toks")).as("text"))))
      time(s"cut_new_${tag}_r$round")(ScaleConsume(
        d.select(col("doc_id"), newCut(col("__toks")).as("text"))))
    }
    spark.stop()
  }
}

/** Round-13 probe: winnowing's scale claims — (a) fingerprint selection is
  * linear in corpus size (per-doc windows, no cross-doc work), and (b) the
  * overlap join's shuffle carries only the ~2/(w+1)-density fingerprints,
  * not grams. 1x vs 8x corpora with distinct replica suffixes (keeps the
  * natural duplicate rate), shuffle bytes from the task-metrics listener.
  */
object ScaleWin {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val d1 = Tables.read(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val d8 = (0 until 8).map(i =>
      d1.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))).reduce(_ union _)
    def settle(): Long = {
      var prev = -1L; var cur = shuffleBytes.get; var waited = 0
      while (cur != prev && waited < 20000) {
        prev = cur; Thread.sleep(500); waited += 500; cur = shuffleBytes.get
      }
      cur
    }
    def run(name: String)(f: => Long): Unit = {
      settle(); shuffleBytes.set(0L)
      val t0 = System.nanoTime(); val n = f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SCALE $name rows=$n%d t=$t%.2f shuffle_mb=${settle() / 1e6}%.1f")
    }
    run("warmup")(d8.count())
    for (round <- 0 to 1; (tag, d) <- Seq("1x" -> d1, "8x" -> d8)) {
      run(s"win_fp_${tag}_r$round")(
        ScaleConsume(Winnow.fingerprints(d, "doc_id", "text")))
      run(s"win_overlap_${tag}_r$round")(
        ScaleConsume(Winnow.overlap(d, "doc_id", "text")))
      // r14: the span report must stay fingerprint-sized too — the
      // position explode happens AFTER the minShared gate, so only
      // passing pairs pay it
      run(s"win_spans_${tag}_r$round")(
        ScaleConsume(Winnow.overlapSpans(d, "doc_id", "text")))
    }
    spark.stop()
  }
}

/** r15 rig: connected components must iterate the EDGE-ENDPOINT subgraph,
  * not the corpus. Fixed chain-shaped edge set (2^10-long chains force ~10
  * pointer-jump rounds) over an isolated-vertex corpus growing 1x -> 16x:
  * per-round cost must stay flat — the corpus may appear in exactly ONE
  * join (the final label attach), so total time should grow far slower
  * than rounds x corpus. Before the rewrite every round materialized and
  * self-joined the full vertex frame (rounds x corpus shuffles).
  */
object ScaleCC {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    import spark.implicits._
    def vertices(n: Long) = spark.range(n).select(col("id"))
    // 64 chains of length 1024 within ids [0, 65536): diameter 1023,
    // ~10 rounds with pointer jumping; every other vertex is isolated
    val edges = spark.range(64L * 1024L)
      .where(pmod(col("id"), lit(1024)) =!= 1023)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    def run(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    run("warmup")(vertices(1L << 25).count())
    for (round <- 0 to 1; (tag, n) <- Seq("1x" -> (1L << 21), "16x" -> (1L << 25))) {
      run(s"cc_${tag}_r$round") {
        // localEdgeLimit=0: this rig measures the DISTRIBUTED iteration's
        // per-round cost shape — the local union-find fallback would
        // otherwise serve this 65k-edge set and measure nothing
        val (res, iters) = ConnectedComponents.componentsAndRounds(
          spark, vertices(n), edges, "id", "a", "b", localEdgeLimit = 0)
        val out = res.where(col("component") =!= col("id")).count()
        println(s"SCALE cc_${tag}_r$round rounds=$iters")
        out
      }
    }
    spark.stop()
  }
}

/** r16 rig: SFT render/truncate cost must scale with TURN rows (the one
  * conversation-key exchange + window + same-key groupBy), not with
  * conversation count x corpus and not with how turns distribute across
  * conversations. Two probes on synthesized turn tables: (a) the SAME
  * 4M turn rows as 1M small conversations (4 turns) vs 16k large ones
  * (256 turns) — times should be comparable (the groupBy buffer grows,
  * the exchange does not); (b) 4M -> 16M turn rows at fixed shape —
  * time should grow ~linearly. truncate budget is set high so no row
  * drops (cost, not semantics, is under test here; q141 gates semantics).
  */
object ScaleSft {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    def turns(nTurns: Long, perConv: Long) =
      spark.range(nTurns).select(
        // integer DIV (the q160 convention): the intent is integer
        // division, and double-divide-then-cast loses exactness past 2^53
        expr(s"id div $perConv").as("conv"),
        pmod(col("id"), lit(perConv)).as("idx"),
        when(pmod(col("id"), lit(2)) === 0, "user")
          .otherwise("assistant").as("role"),
        concat(lit("turn content number "),
          pmod(col("id"), lit(997)).cast("string")).as("content"))
    def run(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val fit = operators.Sft.truncateToBudget(df, "conv", "idx", "role",
        "content", maxChars = 1L << 40)
      val r = operators.Sft.render(fit, "conv", "idx", "role", "content")
        .agg(sum(length(col("text"))).as("chars"),
          sum(size(col("spans"))).as("spans")).head()
      println(f"SCALE $name chars=${r.getLong(0)}%d spans=${r.getLong(1)}%d " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    run("warmup")(turns(1L << 20, 4))
    for (round <- 0 to 1) {
      run(s"sft_4m_small_r$round")(turns(1L << 22, 4))    // 1M convs x 4
      run(s"sft_4m_large_r$round")(turns(1L << 22, 256))  // 16k convs x 256
      run(s"sft_16m_small_r$round")(turns(1L << 24, 4))   // 4x the rows
    }
    spark.stop()
  }
}

/** Bucketed-upsert cost shape (the [[graft.streaming.UpsertStream.runBucketed]]
  * contract): a CDC micro-batch against a bucketed snapshot costs
  * O(delta-keys x bucket bytes), NOT O(snapshot) — under the fixed-bucket-
  * SIZE policy a 100 TB table would use (buckets per snapshot grow with
  * the data so each bucket stays a constant size, here ~64k rows).
  *
  * Probes: a fixed 8-key update delta against 4M rows / 64 buckets and
  * 16M rows / 256 buckets. Bucketed batch time should stay ~FLAT across
  * the 4x snapshot growth (the delta touches <= 8 constant-size buckets
  * either way — 512k rows merged at both scales), while the versioned
  * full-rewrite path grows ~linearly — the r16 verdict's "first thing to
  * replace if streaming CDC ever meets a large snapshot", replaced and
  * measured.
  *
  * Hash bucketing caveat, stated: xxhash64 destroys key locality, so
  * "touched buckets" is bounded by the delta's DISTINCT KEY count, not by
  * key adjacency. A delta with more distinct keys than buckets touches
  * everything and degrades to the full-rewrite cost — the policy knob is
  * bucket count, exactly as in MERGE-format tables.
  */
object ScaleBucketedUpsert {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale_bup_")
    def seed(n: Long) = spark.range(n).select(
      col("id").as("k"),
      concat(lit("payload "), (col("id") % 997).cast("string")).as("v"),
      lit(0L).as("seq"),
      lit(false).as(streaming.UpsertStream.DeleteCol))
    def delta(of: Long) = spark.range(8).select(
      (col("id") * (of / 8)).as("k"), lit("updated").as("v"),
      lit(1L).as("seq"), lit(false).as(streaming.UpsertStream.DeleteCol))
    for ((nSnap, nBuckets) <- Seq((1L << 22, 64), (1L << 24, 256))) {
      val snapB = s"$tmp/bucketed_$nSnap"
      val snapF = s"$tmp/full_$nSnap"
      // seed both layouts, untimed
      streaming.UpsertStream.processBucketedBatch(seed(nSnap), snapB,
        Seq("k"), "seq", nBuckets)
      seed(nSnap).drop(streaming.UpsertStream.DeleteCol)
        .write.mode("overwrite").parquet(s"$snapF/v0")
      for (round <- 0 to 1) {
        var t0 = System.nanoTime()
        streaming.UpsertStream.processBucketedBatch(delta(nSnap), snapB,
          Seq("k"), "seq", nBuckets)
        println(f"SCALE bucketed_${nSnap}_r$round " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.2f")
        t0 = System.nanoTime()
        operators.Upsert.applyChanges(
            spark.read.parquet(s"$snapF/v$round"), delta(nSnap),
            Seq("k"), "seq", streaming.UpsertStream.DeleteCol)
          .write.mode("overwrite").parquet(s"$snapF/v${round + 1}")
        println(f"SCALE fullrewrite_${nSnap}_r$round " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
