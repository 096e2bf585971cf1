package graft
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(32)
    val d = Tables.read(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROF $name = $r in ${(System.nanoTime()-t0)/1e9}s")
    }
    time("warmup count")(d.count())
    time("tokens sum")(d.select(sum(size(tokens(col("text"))))).head())
    time("shingleSet sum")(d.select(sum(size(shingleSet(col("text"), 4)))).head())
    time("shingleSet x2")(d.select(sum(size(shingleSet(col("text"), 4)))).head())
    time("minhash16")(d.select(sum(size(minHashSignature(shingleSet(col("text"),3),16)))).head())
    time("explode count")(d.select(col("doc_id"), explode(shingleSet(col("text"),4)).as("s")).count())
    val e = Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    time("emb count")(e.count())
    import graft.functions.VectorFunctions._
    time("normalize sum")(e.select(sum(size(normalize(col("embedding"))))).head())
    time("hyperlsh16")(e.select(sum(hyperplaneLsh(col("embedding"),16))).head())
    // bm25 stage anatomy (q74 at sf0.1)
    val qs = d.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ", slice(tokens(col("text")), 1, 8)).as("q_text"))
    time("bm25 qterms")(qs.select(explode(tokens(col("q_text")))).distinct().count())
    time("bm25 explode+count")(d.select(col("doc_id"),
      explode(tokens(col("text"))).as("term")).count())
    time("bm25 full 1st")(graft.operators.Bm25.topK(d, "doc_id", "text", qs,
      "q_id", "q_text", k = 5).count())
    time("bm25 full 2nd")(graft.operators.Bm25.topK(d, "doc_id", "text", qs,
      "q_id", "q_text", k = 5).count())
    time("bm25 full 3rd")(graft.operators.Bm25.topK(d, "doc_id", "text", qs,
      "q_id", "q_text", k = 5).count())
    // bm25 internals
    import graft.operators.Bm25
    val toksDf = d.select(col("doc_id"), shinglesAllFast(col("text"), 1).as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("doc_id"), size(col("ts")).as("dl"), explode(col("ts")).as("term"))
    val qt = qs.select(col("q_id"), explode(tokens(col("q_text"))).as("term"))
    time("bm25 stats")(d.select(size(shinglesAllFast(col("text"), 1)).as("dl"))
      .where(col("dl") > 0).agg(count(lit(1)), sum("dl")).count())
    time("bm25 ptoks")(toksDf.join(broadcast(qt.select("term").distinct()), Seq("term")).count())
    time("bm25 postings")(toksDf.join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"), first("dl")).count())
    // DSIR stage anatomy (q76 at sf0.1)
    val grams = concat(wordShingles(col("text"), 1), wordShingles(col("text"), 2))
    val bucketCol = (conv(substring(md5(concat(col("g"), lit(":imp"))), 1, 4), 16, 10)
      .cast("long") % 4096).as("b")
    time("dsir grams explode")(d.select(col("doc_id"), explode(grams).as("g")).count())
    time("dsir buckets")(d.select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), bucketCol).count())
    time("dsir perdoc agg")(d.select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), bucketCol)
      .groupBy("doc_id", "b").count().count())
    val tgt = d.where(col("source").isin("src0", "src1"))
    time("dsir full 1st")(graft.operators.Importance.weights(d, tgt, "doc_id", "text").count())
    time("dsir full 2nd")(graft.operators.Importance.weights(d, tgt, "doc_id", "text").count())
    spark.stop()
  }
}

/** Stage anatomy of the expensive release/lifecycle gates (q85, and the
  * q93/q132 per-rep query paths) — the r16 verdict asked for this cost
  * breakdown once, recorded in DESIGN, so future rounds stop re-auditing
  * the same ~21 s of tape. Stage outputs are localCheckpoint'd so each
  * timer covers exactly one stage, not its lineage.
  */
object ProfGates {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(32)
    GraftFunctions.register(spark)
    import graft.operators._
    val d = Tables.read(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name = $r in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup")(d.count())
    // --- q85 stage anatomy ---
    val (_, rpb) = TextDedup.tuneBands(0.05, 16)
    var t0 = System.nanoTime()
    val pairs = TextDedup.minHashNearDup(d, "doc_id", "text",
      shingleN = 4, numHashes = 16, rowsPerBand = rpb, threshold = 0.05)
      .localCheckpoint(true)
    println(f"PROF q85.pairs(16x1 LSH + jaccard verify) = ${pairs.count()} " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val comp = ConnectedComponents.components(spark, d.select("doc_id"),
      pairs, "doc_id", "id_a", "id_b", assumeEdgesClosed = true)
      .localCheckpoint(true)
    println(f"PROF q85.cc = ${comp.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val canon = comp.join(d.select("doc_id", "n_chars"), "doc_id")
      .groupBy("component")
      .agg(call_function("graft_kmin",
        struct((-col("n_chars")).as("o"), col("doc_id")), lit(1)).as("tk"))
      .select(col("component"), col("tk")(0)("doc_id").as("doc_id"))
      .localCheckpoint(true)
    println(f"PROF q85.canon = ${canon.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val bench = d.where(col("doc_id") % 29 === 0)
    t0 = System.nanoTime()
    val cleaned = Decontaminate.clean(
      d.join(canon, "doc_id").where(col("doc_id") % 29 =!= 0),
      bench, "doc_id", "text", shingleN = 4).localCheckpoint(true)
    println(f"PROF q85.decontaminate = ${cleaned.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val w = Importance.weights(d,
      d.where(col("source").isin("src0", "src1")), "doc_id", "text")
      .localCheckpoint(true)
    println(f"PROF q85.dsir_weights = ${w.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    time("q85.tail(top200 + join + split agg)") {
      val sel = w.agg(call_function("graft_kmin",
          struct((-col("weight")).as("o"), col("doc_id"), col("weight")),
          lit(200)).as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.doc_id").as("doc_id"), col("e.weight").as("weight"))
      cleaned.join(sel, "doc_id").count()
    }
    time("q85.total(as benched)")(
      SparkEntry.queries("q85_corpus_release")(spark, "/root/testdata/sf0.1").count())
    // --- q93/q132 per-rep anatomy: store cached, reps pay the DOUBLE
    // query path (latest + rollback) the paths_equal gate requires ---
    time("q93.total 1st(build if cold)")(
      SparkEntry.queries("q93_index_lifecycle")(spark, "/root/testdata/sf0.1").count())
    time("q93.total 2nd(store cached)")(
      SparkEntry.queries("q93_index_lifecycle")(spark, "/root/testdata/sf0.1").count())
    time("q132.total 1st(build if cold)")(
      SparkEntry.queries("q132_winnow_lifecycle")(spark, "/root/testdata/sf0.1").count())
    time("q132.total 2nd(store cached)")(
      SparkEntry.queries("q132_winnow_lifecycle")(spark, "/root/testdata/sf0.1").count())
    // --- q120 per-rep anatomy (r19 verdict item 5: the one headline
    // member trending up across driver tapes, 1.72 → 1.88 → 3.11 min).
    // The store is content-addressed-cached, so reps never pay the
    // k-means — the build is timed separately here on a throwaway dir to
    // bound what a cache miss WOULD cost; the rest mirrors the gate body
    // stage by stage ---
    time("q120.total 1st(build if cold)")(
      SparkEntry.queries("q120_diversity_tail")(spark, "/root/testdata/sf0.1").count())
    time("q120.total 2nd(store cached)")(
      SparkEntry.queries("q120_diversity_tail")(spark, "/root/testdata/sf0.1").count())
    locally {
      val emb = Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
      val tmpI = java.nio.file.Files.createTempDirectory("graft_prof_q120_").toString
      time("q120.ivf_build(cold-miss cost only)") {
        Ivf.write(Ivf.build(emb, nCells = 8, trainSample = 10000), tmpI); 1
      }
      val assignment = Ivf.open(spark, tmpI).assigned
        .select(col("id").as("vec_id"), col("cell"))
      time("q120.assigned_read")(assignment.count())
      val tailKeep = assignment.where(col("cell") === 7)
        .withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("cell")
            .orderBy(xxhash64(col("vec_id"), lit(42)).asc, col("vec_id").asc)))
        .where(col("__r") <= 3).drop("__r")
      val corpus = assignment.where(col("cell") =!= 7)
        .unionByName(tailKeep).cache()
      time("q120.corpus_counts")(corpus.count())
      time("q120.d4_sample")(
        DiversitySample.clusterBalancedFrom(corpus, "vec_id", perCluster = 10)
          .groupBy("cell").count().count())
      time("q120.uniform_baseline")(
        corpus.orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
          .limit(73).groupBy("cell").count().count())
      corpus.unpersist()
    }
    spark.stop()
  }
}
