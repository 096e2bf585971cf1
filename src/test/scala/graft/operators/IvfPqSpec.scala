package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.Files

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters, 25 points each, 64-dim
  private def corpus = {
    val rnd = new scala.util.Random(13)
    val protos = Array.fill(4)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 4; i <- 0 until 25) yield {
      val v = protos(c).map(x => x + 0.03f * rnd.nextGaussian().toFloat)
      ((c * 100 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("probe + ADC + rerank recovers brute-force neighbors") {
    val idx = IvfPq.build(corpus, nCells = 4, m = 8, kc = 16, trainSample = 200)
    val probes = corpus.where(col("vec_id").isin(0L, 100L, 200L, 300L))
    val got = IvfPq.query(idx, probes, k = 5, nProbe = 3, shortlist = 25)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = Knn.bruteForce(probes, corpus, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("non-unit-norm corpus: probe runs in the centroids' raw space") {
    // scale each cluster to a very different magnitude (1x..64x): the IVF
    // cells are trained and assigned on RAW vectors, so probing with the
    // normalized query against them would rank cells by centroid norm and
    // probe the wrong cells for every large-norm query — recall collapses
    val scaled = corpus.withColumn("embedding",
      transform(col("embedding"),
        x => x * pow(lit(4.0), col("vec_id") / 100).cast("float")))
    val idx = IvfPq.build(scaled, nCells = 4, m = 8, kc = 16, trainSample = 200)
    val probes = scaled.where(col("vec_id").isin(0L, 100L, 200L, 300L))
    // nProbe=2 absorbs k-means splitting a cluster across two cells; the
    // normalized-probe bug ranks every query's cells by centroid norm and
    // reaches only the smallest-norm cells — recall ~0.5 here, ~0.25 at 1
    val got = IvfPq.query(idx, probes, k = 5, nProbe = 2, shortlist = 25)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = Knn.bruteForce(probes, scaled, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"raw-space probe must find each query's own cluster " +
      s"cells at nProbe=2 on a norm-varying corpus; recall $recall")
  }

  test("payload filter: persisted coded store answers filtered brute force") {
    val labeled = corpus.withColumn("label",
      (col("vec_id") % 2).cast("int"))
    val dir = Files.createTempDirectory("ivfpq_payload").toString
    IvfPq.write(IvfPq.build(labeled, nCells = 4, m = 8, kc = 16,
      trainSample = 200, payload = Seq("label")), dir)
    val idx = IvfPq.open(spark, dir)
    assert(idx.coded.columns.contains("label"), "payload survives the store")
    val probes = labeled.where(col("vec_id").isin(0L, 100L, 200L, 300L))
    // exhaustive probe + full shortlist ⇒ exact over the filtered corpus
    val got = IvfPq.query(idx, probes, k = 5, nProbe = 4, shortlist = 100,
        filter = Some(col("label") === 0))
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = Knn.bruteForce(probes,
        labeled.where(col("label") === 0), k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"filtered recall $recall")
    assert(got.forall { case (_, n) => n % 2 == 0 },
      "every neighbor satisfies the predicate")
  }

  test("payload-partitioned coded store: layout on disk, append + compact preserve it, filtered answers exact") {
    val labeled = corpus.withColumn("label", (col("vec_id") % 2).cast("int"))
    val base = labeled.where(col("vec_id") % 100 < 20)
    val batch = labeled.where(col("vec_id") % 100 >= 20)
    val dir = Files.createTempDirectory("ivfpq_partpay").toString
    IvfPq.write(IvfPq.build(base, nCells = 4, m = 8, kc = 16,
        trainSample = 200, payload = Seq("label")), dir,
      partitionPayload = Seq("label"))
    assert(new File(s"$dir/cells").listFiles()
      .count(_.getName.startsWith("label=")) === 2)
    // append auto-carries the payload and respects the lifted layout
    IvfPq.append(batch, dir, batchId = 1)
    assert(new File(s"$dir/cells/label=1").listFiles()
      .flatMap(_.listFiles()).exists(_.getName == "batch_id=1"),
      "appended batch must land under the label partition dirs")
    val dest = Files.createTempDirectory("ivfpq_partpay_c").toString
    IvfPq.compactTo(spark, dir, dest)
    assert(new File(s"$dest/cells").listFiles()
      .exists(_.getName.startsWith("label=")), "compact preserves the layout")
    // exhaustive filtered query over the compacted store == filtered brute
    // force over base + batch
    val probes = labeled.where(col("vec_id").isin(0L, 100L, 200L, 300L))
    val got = IvfPq.query(IvfPq.open(spark, dest), probes, k = 5, nProbe = 4,
        shortlist = 100, filter = Some(col("label") === 0))
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = Knn.bruteForce(probes, labeled.where(col("label") === 0), k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"filtered recall $recall")
    // the lifecycle continues on the compacted store (manifest must not
    // have picked up batch_id or partition-inferred types)
    IvfPq.append(labeled.where(col("vec_id") === 0L)
      .withColumn("vec_id", col("vec_id") + 9000L), dest, batchId = 1)
    assert(IvfPq.open(spark, dest).coded
      .where(col("id") === 9000L).count() === 1,
      "append after compactTo must keep working")
  }

  test("compactTo rewrites the coded store; query answers unchanged") {
    val tmp = Files.createTempDirectory("graft_ivfpqcmp_").toString
    val base = corpus.where(col("vec_id") % 100 < 20)
    val batch = corpus.where(col("vec_id") % 100 >= 20)
    IvfPq.write(IvfPq.build(base, nCells = 4, m = 8, kc = 16, trainSample = 200), tmp)
    IvfPq.append(batch, tmp, batchId = 1)
    val dest = Files.createTempDirectory("graft_ivfpqcmpd_").toString
    IvfPq.compactTo(spark, tmp, dest)
    val probes = batch.where(col("vec_id").isin(20L, 120L, 220L, 320L))
    def ans(p: String) = IvfPq
      .query(IvfPq.open(spark, p), probes, k = 5, nProbe = 3, shortlist = 25)
      .select("q_id", "n_id", "sim").as[(Long, Long, Double)].collect().toSet
    assert(ans(dest) === ans(tmp))
    // one batch-0 dir per cell after compaction
    for (cellDir <- new File(s"$dest/cells").listFiles()
           .filter(_.getName.startsWith("cell="))) {
      assert(cellDir.listFiles().filter(_.getName.startsWith("batch_id="))
        .map(_.getName).toSet === Set("batch_id=0"))
    }
  }

  test("append encodes with stored centroids AND codebooks; queries see the batch") {
    val tmp = Files.createTempDirectory("graft_ivfpqapp_").toString
    val base = corpus.where(col("vec_id") % 100 < 20)   // 80 rows
    val batch = corpus.where(col("vec_id") % 100 >= 20) // 20 rows, new ids
    IvfPq.write(IvfPq.build(base, nCells = 4, m = 8, kc = 16, trainSample = 200), tmp)
    IvfPq.append(batch, tmp, batchId = 1)
    // replayed append (same batchId) replaces its prior attempt
    IvfPq.append(batch, tmp, batchId = 1)

    val opened = IvfPq.open(spark, tmp)
    assert(opened.coded.count() === 100)
    // appended rows carry codes from the STORED codebooks
    val batchCodes = opened.coded.join(batch.select(col("vec_id").as("id")), Seq("id"))
      .select("codes").as[Seq[Int]].collect()
    assert(batchCodes.length === 20 && batchCodes.forall(_.length == 8))
    // no new cell directories
    val cellDirs = new File(s"$tmp/cells").listFiles()
      .count(_.getName.startsWith("cell="))
    assert(cellDirs === 4)
    // a probe finds its appended cluster-mates
    val probes = batch.where(col("vec_id").isin(20L, 120L, 220L, 320L))
    val got = IvfPq.query(opened, probes, k = 5, nProbe = 3, shortlist = 25)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = Knn.bruteForce(probes, corpus, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall after append $recall")
  }

  test("write → open round-trips; query plans only probed cell directories") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val idx = IvfPq.build(corpus, nCells = 4, m = 8, kc = 16, trainSample = 200)
    val tmp = Files.createTempDirectory("graft_ivfpq_").toString
    IvfPq.write(idx, tmp)
    val opened = IvfPq.open(spark, tmp)
    assert(opened.cb == idx.cb, "codebooks round-trip")
    val probes = corpus.where("vec_id = 0")
    val res = IvfPq.query(opened, probes, k = 3, nProbe = 1, shortlist = 10)
    val inMem = IvfPq.query(idx, probes, k = 3, nProbe = 1, shortlist = 10)
    assert(res.collect().toSeq == inMem.collect().toSeq)

    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(scans)
    }
    val cellScans = scans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("cells")))
    assert(cellScans.nonEmpty)
    assert(new File(s"$tmp/cells").listFiles()
      .count(_.getName.startsWith("cell=")) == 4)
    // the ADC scan (the one whose read schema has codes but not emb)
    // plans exactly 1 of the 4 cell dirs
    val adcScans = cellScans.filter { s =>
      val names = s.requiredSchema.fieldNames.toSet
      names.contains("codes") && !names.contains("emb")
    }
    assert(adcScans.nonEmpty,
      "ADC scan must read codes WITHOUT the float vectors (column pruning)")
    assert(adcScans.map(_.selectedPartitions.partitionCount).max == 1,
      "ADC scan should plan 1/4 cell directories")
  }
}
