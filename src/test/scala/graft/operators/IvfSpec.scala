package graft.operators

import graft.SparkSpec
import graft.ingest.ExportReader
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF recalls brute-force neighbors on clustered vectors") {
    // 3 well-separated clusters in 8 dims, 30 points each
    def v(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(8)(0.02f * ((i * 7) % 5))
      a(axis) = 1.0f + 0.01f * i
      a
    }
    val rows = for (axis <- Seq(0, 3, 6); i <- 0 until 30)
      yield ((axis * 100 + i).toLong, v(axis, i))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.where("vec_id IN (0, 305, 610)")

    val index = Ivf.build(corpus, nCells = 3)
    val ivf = Ivf.query(index, queries, k = 5, nProbe = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = Knn.bruteForce(queries, corpus, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // nProbe=1 on clean clusters: perfect recall
    assert(ivf === brute)
  }

  test("q65 margin: real-embedding recall comfortably clears the query's 0.55 gate") {
    import graft.Tables
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.read(spark, dir, "embeddings")
      val probes = emb.where(col("vec_id") < 8)
      val idx = Ivf.build(emb, nCells = 16, trainSample = 10000)
      val approx = Ivf.query(idx, probes, k = 5, nProbe = 8).select("q_id", "n_id")
      val exact = Knn.bruteForce(probes, emb, k = 5).select("q_id", "n_id")
      val hits = exact.join(approx, Seq("q_id", "n_id"), "left_semi").count()
      val recall = hits.toDouble / exact.count()
      assert(recall >= 0.7, s"$dir mean recall $recall — q65's 0.55 gate has no margin")
    }
  }

  test("persisted index: a query reads ONLY the probed cells' files") {
    // 4 well-separated clusters, 25 points each
    def v(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(8)(0.01f * ((i * 3) % 4))
      a(axis * 2) = 1.0f + 0.01f * i
      a
    }
    val rows = for (axis <- Seq(0, 1, 2, 3); i <- 0 until 25)
      yield ((axis * 100 + i).toLong, v(axis, i))
    val corpus = rows.toDF("vec_id", "embedding")
    val index = Ivf.build(corpus, nCells = 4)
    val tmp = Files.createTempDirectory("graft_ivf_").toString
    Ivf.write(index, tmp)
    val opened = Ivf.open(spark, tmp)
    assert(opened.nCells === 4)

    val queries = corpus.where("vec_id = 0")
    val res = Ivf.query(opened, queries, k = 3, nProbe = 1)
    val got = res.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // clean clusters, nProbe=1: perfect recall vs brute force
    val brute = Knn.bruteForce(queries, corpus, k = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(got === brute)

    // the proof: the cells scan planned files from exactly ONE cell
    // directory out of 4 — partition pruning from the static probed-cell
    // filter, the read path a 1000-executor query depends on
    val cellScans = graft.util.PlanScans.fileScansOf(res, "cells")
    assert(cellScans.nonEmpty, "expected a parquet scan of the persisted cells")
    val cellDirs = new File(s"$tmp/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.length === 4, s"expected one dir per cell, got ${cellDirs.length}")
    // selectedPartitions is the post-pruning listing the scan actually reads
    val plannedDirs = cellScans.map(_.selectedPartitions.partitionCount).max
    assert(plannedDirs === 1,
      s"query should plan 1/4 cell directories, planned $plannedDirs/4")
    // and the static partition filter is in the plan, not a post-scan filter
    assert(cellScans.exists(_.partitionFilters.nonEmpty),
      "probed-cell isin should be a partition filter at the scan")
  }

  test("payload columns persist through write/open; filtered query = filtered brute force") {
    import org.apache.spark.sql.functions._
    def v(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(8)(0.02f * ((i * 7) % 5))
      a(axis) = 1.0f + 0.01f * i
      a
    }
    val rows = for (axis <- Seq(0, 3, 6); i <- 0 until 30)
      yield ((axis * 100 + i).toLong, v(axis, i), i % 2)
    val corpus = rows.toDF("vec_id", "embedding", "label")
    val dir = Files.createTempDirectory("ivf_payload").toString
    Ivf.write(Ivf.build(corpus, nCells = 3, payload = Seq("label")), dir)
    val idx = Ivf.open(spark, dir)
    assert(idx.assigned.columns.contains("label"), "payload survives the store")

    val queries = corpus.where("vec_id IN (0, 305, 610)")
    // exhaustive probe: filtered result must equal brute force over the
    // label-filtered corpus exactly
    val got = Ivf.query(idx, queries, k = 5, nProbe = 3,
        filter = Some(col("label") === 1))
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val want = Knn.bruteForce(queries, corpus.where(col("label") === 1), k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    // every returned neighbor satisfies the predicate (pruned-probe path)
    val pruned = Ivf.query(idx, queries, k = 5, nProbe = 1,
        filter = Some(col("label") === 1))
      .join(idx.assigned.select(col("id").as("n_id"), col("label")), "n_id")
    assert(pruned.where(col("label") =!= 1).count() === 0)

    // append schema contract: the STORE defines the payload set. A batch
    // appended without the label column would read back with null payloads
    // and silently vanish from every filtered query — so it must fail
    // loudly instead, and the default (Nil) must auto-carry the stored set.
    val batch = Seq((9000L, v(0, 99), 1)).toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Ivf.append(batch.drop("label"), dir, batchId = 1)
    }
    assert(e.getMessage.contains("label"), s"names the column: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      Ivf.append(batch, dir, batchId = 1, payload = Seq("wrong_col"))
    }
    Ivf.append(batch, dir, batchId = 1) // Nil auto-carries Seq("label")
    val after = Ivf.open(spark, dir)
    val appended = after.assigned.where(col("id") === 9000L).collect()
    assert(appended.length === 1 && appended.head.getAs[Int]("label") === 1,
      "auto-carried payload must land non-null")
  }

  test("payload-partitioned store: filter prunes label directories at the scan; layout survives append+compact") {
    import org.apache.spark.sql.functions._
    def v(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(8)(0.01f * ((i * 3) % 4))
      a(axis * 2) = 1.0f + 0.01f * i
      a
    }
    val rows = for (axis <- Seq(0, 1, 2, 3); i <- 0 until 25)
      yield ((axis * 100 + i).toLong, v(axis, i), i % 2)
    val corpus = rows.toDF("vec_id", "embedding", "label")
    val dir = Files.createTempDirectory("ivf_partpay").toString
    Ivf.write(Ivf.build(corpus, nCells = 4, payload = Seq("label")), dir,
      partitionPayload = Seq("label"))
    // layout on disk: label=*/cell=*/batch_id=*
    val labelDirs = new File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("label="))
    assert(labelDirs.length === 2, s"expected label dirs, got ${
      new File(s"$dir/cells").listFiles().map(_.getName).toSeq}")
    assert(labelDirs.forall(_.listFiles().exists(_.getName.startsWith("cell="))))

    val opened = Ivf.open(spark, dir)
    val queries = corpus.where("vec_id = 0")
    val res = Ivf.query(opened, queries, k = 3, nProbe = 1,
      filter = Some(col("label") === 1))
    // correctness first: equals brute force over the label-filtered corpus
    // within the probed cell (clean clusters → the probed cell holds them)
    val got = res.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val want = Knn.bruteForce(queries, corpus.where(col("label") === 1), k = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    // the lever's proof: the cells scan plans files from exactly ONE
    // (label, cell) leaf out of 2 labels x 4 cells = 8 — the filter
    // attribute prunes DIRECTORIES, not just row groups
    val cellScans = graft.util.PlanScans.fileScansOf(res, "cells")
    assert(cellScans.nonEmpty)
    val planned = cellScans.map(_.selectedPartitions.partitionCount).max
    assert(planned === 1,
      s"filtered query should plan 1/8 (label, cell) leaves, planned $planned")

    // append auto-carries the payload AND the directory layout; compact
    // preserves both
    val batch = Seq((9000L, v(0, 7), 1)).toDF("vec_id", "embedding", "label")
    Ivf.append(batch, dir, batchId = 1)
    val b1 = new File(s"$dir/cells/label=1")
      .listFiles().flatMap(_.listFiles()).map(_.getName)
    assert(b1.contains("batch_id=1"), s"append must respect the layout: ${b1.toSeq}")
    val dest = Files.createTempDirectory("ivf_partpay_c").toString
    Ivf.compactTo(spark, dir, dest)
    assert(new File(s"$dest/cells").listFiles()
      .exists(_.getName.startsWith("label=")), "compact must preserve the layout")
    val after = Ivf.query(Ivf.open(spark, dest), queries, k = 3, nProbe = 4,
        filter = Some(col("label") === 1))
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val wantAll = Knn.bruteForce(queries,
        corpus.union(batch).where(col("label") === 1), k = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(after === wantAll, "compacted store answers over base + append")

    // the daily-ingest lifecycle continues on the COMPACTED store: its
    // regenerated manifest must carry the same payload contract (and must
    // NOT have recorded batch_id — a re-opened index carries it as a
    // partition column)
    val day2 = Seq((9100L, v(3, 13), 0)).toDF("vec_id", "embedding", "label")
    Ivf.append(day2, dest, batchId = 1)
    val compactedPlus = Ivf.open(spark, dest).assigned
    assert(compactedPlus.where(col("id") === 9100L).count() === 1,
      "append after compactTo must keep working")
    assert(compactedPlus.where(col("id") === 9100L)
      .head().getAs[Int]("label") === 0)
  }

  test("default-layout rewrite replaces a stale partitioned layout; type-mismatched appends rejected") {
    import org.apache.spark.sql.functions._
    def v(i: Int): Array[Float] = {
      val a = Array.fill(8)(0.02f * ((i * 7) % 5)); a(0) = 1.0f + 0.01f * i; a
    }
    val corpus = (0 until 40).map(i => (i.toLong, v(i), i % 2))
      .toDF("vec_id", "embedding", "label")
    val dir = Files.createTempDirectory("ivf_relayout").toString
    Ivf.write(Ivf.build(corpus, nCells = 2, payload = Seq("label")), dir,
      partitionPayload = Seq("label"))
    assert(Ivf.storedLayout(spark, dir) === Seq("label"))
    // the documented rebuild path: build + write at the SAME path with the
    // default layout — the stale marker must be replaced, or the next
    // append would resurrect label dirs inside a flat store and corrupt
    // partition discovery
    Ivf.write(Ivf.build(corpus, nCells = 2, payload = Seq("label")), dir)
    assert(Ivf.storedLayout(spark, dir) === Nil,
      "default-layout rewrite must clear the lifted-column marker")
    assert(!new File(s"$dir/cells").listFiles()
      .exists(_.getName.startsWith("label=")), "cells flat after rewrite")
    val batch = Seq((9000L, v(99), 1)).toDF("vec_id", "embedding", "label")
    Ivf.append(batch, dir, batchId = 1)
    assert(!new File(s"$dir/cells").listFiles()
      .exists(_.getName.startsWith("label=")),
      "append must follow the rewritten (flat) layout")
    assert(Ivf.open(spark, dir).assigned.count() === 41)
    // type contract: a batch whose payload column type conflicts with the
    // base build is rejected AT APPEND TIME (a landed append would poison
    // every later read — cells are read without mergeSchema)
    val bad = Seq((9001L, v(98), 1L)).toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Ivf.append(bad, dir, batchId = 2)
    }
    assert(e.getMessage.contains("type") && e.getMessage.contains("label"),
      s"names the conflict: ${e.getMessage}")
  }

  test("pre-manifest store (no layout dir): appends fall back to the cells schema") {
    import org.apache.spark.sql.functions._
    def v(i: Int): Array[Float] = {
      val a = Array.fill(8)(0.02f * ((i * 7) % 5)); a(0) = 1.0f + 0.01f * i; a
    }
    val corpus = (0 until 30).map(i => (i.toLong, v(i), i % 2))
      .toDF("vec_id", "embedding", "label")
    val dir = Files.createTempDirectory("ivf_premanifest").toString
    Ivf.write(Ivf.build(corpus, nCells = 2, payload = Seq("label")), dir)
    // simulate a store written before the layout manifest existed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/layout"), true)
    // auto-carry still works (payload derived from the cells schema) and
    // so do the loud failures
    intercept[IllegalArgumentException] {
      Ivf.append(Seq((900L, v(50))).toDF("vec_id", "embedding"),
        dir, batchId = 1)
    }
    Ivf.append(Seq((900L, v(50), 0)).toDF("vec_id", "embedding", "label"),
      dir, batchId = 1)
    val after = Ivf.open(spark, dir)
    assert(after.assigned.count() === 31)
    assert(after.assigned.where(col("id") === 900L)
      .head().getAs[Int]("label") === 0)
  }

  test("query shuffles k-capped heaps, not scored candidates") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val nPart = 6
    val corpus = (0L until 300L).map { i =>
      val a = Array.fill(8)(0.01f * ((i % 5).toInt))
      a((i % 4).toInt * 2) = 1.0f
      (i, a)
    }.toDF("vec_id", "embedding").repartition(nPart).cache()
    corpus.count()
    val index = Ivf.build(corpus, nCells = 4)
    val queries = corpus.where("vec_id < 2")
    val res = Ivf.query(index, queries, k = 3, nProbe = 2)
    res.collect()

    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = {
      val self = p match { case s: ShuffleExchangeLike => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(shuffles)
    }
    val kminShuffles = shuffles(res.queryExecution.executedPlan)
      .filter(_.child.toString.contains("graft_kmin"))
    assert(kminShuffles.nonEmpty, "expected partial-kmin exchanges")
    val written = kminShuffles
      .map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
    // cell-selection + final ranking: each carries <= queries x partitions
    // heap rows; the old row_number plan would shuffle ~2x75 scored rows
    assert(written > 0 && written <= 2L * 2 * nPart,
      s"kmin should bound both ANN exchanges, wrote $written records")
    corpus.unpersist()
  }

  test("boundedSample: bounded, deterministic, and runs NO job when built") {
    val df = (0L until 1000L).map(i => (i, s"r$i")).toDF("id", "s").repartition(8)
    val a = Ivf.boundedSample(df, maxRows = 80, seed = 7L).collect().map(_.getLong(0))
    val b = Ivf.boundedSample(df, maxRows = 80, seed = 7L).collect().map(_.getLong(0))
    assert(a.length <= 80 && a.length >= 8) // every partition contributes
    assert(a.toSeq === b.toSeq) // seeded reservoir is reproducible
    assert(a.distinct.length === a.length)

    // the sampling step itself must be lazy — a DataFrame whose evaluation
    // throws only blows up if boundedSample runs a pre-pass (the count()
    // job the old fraction-based sample needed)
    val poisoned = spark.createDataFrame(
      df.rdd.map[org.apache.spark.sql.Row](_ =>
        throw new IllegalStateException("sampling ran a job")),
      df.schema)
    Ivf.boundedSample(poisoned, maxRows = 10) // must not throw
  }

  test("append encodes with STORED centroids and extends the cell directories") {
    def v(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(8)(0.02f * ((i * 7) % 5))
      a(axis) = 1.0f + 0.01f * i
      a
    }
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    val tmp = Files.createTempDirectory("graft_ivfapp_").toString
    Ivf.write(Ivf.build(base, nCells = 3), tmp)

    // a later batch from the same clusters — new ids, stored centroids
    val batch = (for (axis <- Seq(0, 3, 6); i <- 20 until 30)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.append(batch, tmp, batchId = 1)
    // replayed append (same batchId) replaces its prior attempt
    Ivf.append(batch, tmp, batchId = 1)

    val opened = Ivf.open(spark, tmp)
    assert(opened.assigned.count() === 90)
    // appended rows landed in their argmin cell: cell directories still
    // number nCells (no new partition values appeared)
    val cellDirs = new File(s"$tmp/cells").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.size === 3, s"append created new cells: $cellDirs")
    // and a query whose true neighbors are appended docs finds them
    // through the same nProbe=1 pruned read
    val probe = batch.where("vec_id = 1029")
    val got = Ivf.query(opened, probe, k = 3, nProbe = 1)
      .select("n_id").as[Long].collect().toSet
    val brute = Knn.bruteForce(probe, base.unionByName(batch), k = 3)
      .select("n_id").as[Long].collect().toSet
    assert(got === brute, "appended docs must be reachable at nProbe=1")
  }

  test("compactTo collapses appended batches; queries and cellStats survive") {
    def v(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(8)(0.02f * ((i * 7) % 5))
      a(axis) = 1.0f + 0.01f * i
      a
    }
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    val tmp = Files.createTempDirectory("graft_ivfcmp_").toString
    Ivf.write(Ivf.build(base, nCells = 3), tmp)
    // two daily batches — each adds files under its own batch_id
    val b1 = (for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    val b2 = (for (axis <- Seq(0, 3, 6); i <- 25 until 30)
      yield ((2000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.append(b1, tmp, batchId = 1)
    Ivf.append(b2, tmp, batchId = 2)

    val dest = Files.createTempDirectory("graft_ivfcmpd_").toString
    Ivf.compactTo(spark, tmp, dest)
    val src = Ivf.open(spark, tmp)
    val dst = Ivf.open(spark, dest)
    assert(dst.assigned.count() === 90)
    // every cell collapsed to a single batch-0 directory with ONE file
    for (cellDir <- new File(s"$dest/cells").listFiles()
           .filter(_.getName.startsWith("cell="))) {
      val batches = cellDir.listFiles().filter(_.getName.startsWith("batch_id="))
      assert(batches.map(_.getName).toSet === Set("batch_id=0"),
        s"${cellDir.getName}: ${batches.map(_.getName).toSet}")
      assert(batches.head.listFiles().count(_.getName.endsWith(".parquet")) === 1)
    }
    // identical answers through the compacted store
    val probe = b2.where("vec_id = 2025")
    def ans(i: Ivf.Index) = Ivf.query(i, probe, k = 3, nProbe = 1)
      .select("n_id", "sim").as[(Long, Double)].collect().toSet
    assert(ans(dst) === ans(src))
    // the skew monitor: populations sum to the corpus, skew >= 1
    val stats = Ivf.cellStats(dst).collect()
    assert(stats.map(_.getAs[Long]("n")).sum === 90L)
    assert(stats.map(_.getAs[Int]("cell")).toSet === Set(0, 1, 2))
    assert(stats.forall(_.getAs[Double]("skew") >= 1.0))
  }

  test("distributed zip ingest routes members and parses lines in executors") {
    val tmp = Files.createTempDirectory("graft_dzip_").toFile
    def writeZip(name: String, entries: (String, String)*): Unit = {
      val zos = new ZipOutputStream(new FileOutputStream(new File(tmp, name)))
      entries.foreach { case (n, c) =>
        zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8")); zos.closeEntry()
      }
      zos.close()
    }
    writeZip("e1.zip",
      "Manifest.json" -> "{}",
      "TestFlat_20230512.json" -> "{\"GlobalKey\":\"a\"}\n{\"GlobalKey\":\"b\"}",
      "TestFlat_Deleted_20230512.json" -> "{\"GlobalKey\":\"b\"}")
    writeZip("e2.zip",
      "TestFlat_20230513.json" -> "{\"GlobalKey\":\"c\"}")

    val lines = ExportReader.readExportsDistributed(spark, s"${tmp.getAbsolutePath}/*.zip")
    assert(lines.count() === 4) // Manifest filtered
    val schema = StructType(Seq(StructField("GlobalKey", StringType)))
    val flat = ExportReader.parseMembers(lines, "TestFlat", schema)
    assert(flat.select("GlobalKey").as[String].collect().toSet === Set("a", "b", "c"))
    val deleted = ExportReader.parseMembers(lines, "TestFlat_Deleted", schema)
    assert(deleted.select("GlobalKey").as[String].collect().toSet === Set("b"))

    // routing parity with the driver path: a multi-segment name that
    // Transforms.parseFileName rejects must not be routed here either —
    // the two ingest paths must produce the same dataset from one archive
    writeZip("e3.zip",
      "TestFlat_Sub1_Sub2_20230514.json" -> "{\"GlobalKey\":\"z\"}")
    assert(graft.ingest.Transforms
      .parseFileName("TestFlat_Sub1_Sub2_20230514.json").isEmpty)
    val lines3 = ExportReader.readExportsDistributed(spark,
      s"${tmp.getAbsolutePath}/e3.zip")
    assert(ExportReader.parseMembers(lines3, "TestFlat", schema).isEmpty,
      "distributed routing accepted a name the driver path rejects")
  }
}
