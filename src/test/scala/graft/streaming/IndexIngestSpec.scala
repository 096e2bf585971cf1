package graft.streaming

import graft.SparkSpec
import graft.operators.{Bm25, Ivf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class IndexIngestSpec extends SparkSpec {
  import spark.implicits._

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def v(axis: Int, i: Int): Array[Float] = {
    val a = Array.fill(8)(0.02f * ((i * 7) % 5))
    a(axis) = 1.0f + 0.01f * i
    a
  }

  private def writeVecJson(dir: String, name: String,
                           rows: Seq[(Long, Array[Float])]): Unit = {
    val lines = rows.map { case (id, e) =>
      s"""{"vec_id":$id,"embedding":[${e.mkString(",")}]}""" }
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("streams micro-batches into a persisted IVF index; queries see them") {
    val root = Files.createTempDirectory("idxingest").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val idx = s"$root/ivf"; val ckpt = s"$root/ckpt"

    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.write(Ivf.build(base, nCells = 3), idx)

    writeVecJson(in, "b1.json",
      for (axis <- Seq(0, 3, 6); i <- 20 until 25)
        yield (1000 + axis * 100 + i).toLong -> v(axis, i))
    IndexIngest.runIvf(spark, in, vecSchema, idx, ckpt)
    writeVecJson(in, "b2.json",
      for (axis <- Seq(0, 3, 6); i <- 25 until 30)
        yield (2000 + axis * 100 + i).toLong -> v(axis, i))
    IndexIngest.runIvf(spark, in, vecSchema, idx, ckpt)

    val opened = Ivf.open(spark, idx)
    assert(opened.assigned.count() === 90)
    // a probe whose true neighbors arrived on-stream finds them through
    // the same nProbe=1 pruned read as the batch-built index (under
    // cosine the top hits share the probe's i%5 noise pattern, so the
    // nearest is i=24 — streamed id 1624 from batch 1)
    val probe = Seq((2629L, v(6, 29))).toDF("vec_id", "embedding")
    val got = Ivf.query(opened, probe, k = 3, nProbe = 1)
      .select("n_id").as[Long].collect().toSet
    assert(got.size === 3 && got.exists(_ >= 1000L),
      s"expected streamed axis-6 cluster-mates among the neighbors, got $got")

    // restart with no new files: AvailableNow re-run appends nothing
    IndexIngest.runIvf(spark, in, vecSchema, idx, ckpt)
    assert(Ivf.open(spark, idx).assigned.count() === 90)
  }

  test("filtered retrieval over a streamed payload store: appends land in the sealed version, filters see them") {
    // the last untested composition (r11 verdict item 7): streaming appends
    // into a payload-CARRYING (and payload-partitioned) IVF store published
    // through IndexVersions, with filtered queries reading the sealed
    // version. Streamed JSON carries the label column; Ivf.append's
    // auto-carry keeps the store schema, and the filter prunes label
    // directories of streamed batches exactly as it does for the base build.
    val root = Files.createTempDirectory("idxfiltstream").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val ckpt = s"$root/ckpt"
    val lblSchema = StructType(vecSchema.fields :+ StructField("label", IntegerType))

    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i), i % 2))
      .toDF("vec_id", "embedding", "label")
    val v0 = graft.pipeline.IndexVersions.publish(spark, s"$root/store")(p =>
      Ivf.write(Ivf.build(base, nCells = 3, payload = Seq("label")), p,
        partitionPayload = Seq("label")))

    def lblJson(name: String, rows: Seq[(Long, Array[Float], Int)]): Unit = {
      val lines = rows.map { case (id, e, l) =>
        s"""{"vec_id":$id,"embedding":[${e.mkString(",")}],"label":$l}""" }
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    lblJson("b1.json", for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i), i % 2))
    IndexIngest.runIvf(spark, in, lblSchema, v0, ckpt)
    lblJson("b2.json", for (axis <- Seq(0, 3, 6); i <- 25 until 30)
      yield ((2000 + axis * 100 + i).toLong, v(axis, i), i % 2))
    IndexIngest.runIvf(spark, in, lblSchema, v0, ckpt)

    val latest = graft.pipeline.IndexVersions.latest(spark, s"$root/store").get
    assert(latest === v0)
    val opened = Ivf.open(spark, latest)
    assert(opened.assigned.count() === 90)
    assert(opened.assigned.where(col("label").isNull).count() === 0,
      "streamed rows must carry their payload (no null labels)")

    // exhaustive-probe filtered query == brute force over the filtered
    // union of base + both streamed batches
    val streamed = (for (axis <- Seq(0, 3, 6); i <- 20 until 30) yield {
      val pfx = if (i < 25) 1000 else 2000
      ((pfx + axis * 100 + i).toLong, v(axis, i), i % 2)
    }).toDF("vec_id", "embedding", "label")
    val all = base.union(streamed)
    val probe = Seq((9999L, v(6, 29))).toDF("vec_id", "embedding")
    for (lbl <- Seq(0, 1)) {
      val got = Ivf.query(opened, probe, k = 4, nProbe = 3,
          filter = Some(col("label") === lbl))
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      val want = graft.operators.Knn.bruteForce(probe,
          all.where(col("label") === lbl), k = 4)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      assert(got === want, s"label $lbl")
    }
    // and the streamed batches respected the payload-partitioned layout
    val leaf = new java.io.File(s"$v0/cells/label=1")
    assert(leaf.exists() && leaf.listFiles()
      .flatMap(_.listFiles()).exists(_.getName == "batch_id=1"),
      "streamed append must land under the label partition dirs")
  }

  test("a replayed uncommitted micro-batch does not double-append") {
    val root = Files.createTempDirectory("idxingretry").toString
    val idx = s"$root/ivf"
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.write(Ivf.build(base, nCells = 3), idx)

    val batch = (for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    // crash between the append and the checkpoint commit ⇒ the engine
    // replays streaming batch 0 — the append must replace, not duplicate
    val ckpt = s"$root/ckpt"
    IndexIngest.ivfBatch(batch, 0L, idx, ckpt, "vec_id", "embedding")
    IndexIngest.ivfBatch(batch, 0L, idx, ckpt, "vec_id", "embedding")
    assert(Ivf.open(spark, idx).assigned.count() === 75,
      "replayed micro-batch duplicated index rows")
  }

  test("a recreated checkpoint or second stream is refused, not overwritten") {
    val root = Files.createTempDirectory("idxbind").toString
    val idx = s"$root/ivf"
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.write(Ivf.build(base, nCells = 3), idx)

    val b0 = (for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    val b1 = (for (axis <- Seq(0, 3, 6); i <- 25 until 30)
      yield ((2000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    IndexIngest.ivfBatch(b0, 0L, idx, s"$root/ckptA", "vec_id", "embedding")
    IndexIngest.ivfBatch(b1, 1L, idx, s"$root/ckptA", "vec_id", "embedding")
    assert(Ivf.open(spark, idx).assigned.count() === 90)

    // a deleted-and-recreated checkpoint restarts engine batch ids at 0;
    // with a blind batchId+1 mapping this would silently REPLACE the first
    // appended batch's rows — the binding must refuse instead
    val fresh = (for (axis <- Seq(0, 3, 6); i <- 30 until 35)
      yield ((3000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalStateException] {
      IndexIngest.ivfBatch(fresh, 0L, idx, s"$root/ckptB", "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("bound to streaming checkpoint token"))
    assert(Ivf.open(spark, idx).assigned.count() === 90,
      "refused batch must not have touched the store")
  }

  test("binding bases on pre-existing appends; foreign id collision is refused") {
    val root = Files.createTempDirectory("idxbase").toString
    val idx = s"$root/ivf"
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.write(Ivf.build(base, nCells = 3), idx)

    // a manual daily append already owns batch 5 BEFORE the stream starts:
    // the stream must bind base=5 and write batch 6, not batch 1
    val manual = (for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.append(manual, idx, 5L, "vec_id", "embedding")

    val b0 = (for (axis <- Seq(0, 3, 6); i <- 25 until 30)
      yield ((2000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    IndexIngest.ivfBatch(b0, 0L, idx, s"$root/ckpt", "vec_id", "embedding")
    assert(StreamBinding.existingBatchIds(spark, s"$idx/cells") === Set(0L, 5L, 6L))
    assert(Ivf.open(spark, idx).assigned.count() === 90)

    // a manual append that later races INTO the stream's id range: the
    // stream's next batch targets that id and must refuse, not overwrite
    val foreign = (for (axis <- Seq(0, 3, 6); i <- 30 until 32)
      yield ((4000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.append(foreign, idx, 7L, "vec_id", "embedding")
    val b1 = (for (axis <- Seq(0, 3, 6); i <- 32 until 35)
      yield ((5000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalStateException] {
      IndexIngest.ivfBatch(b1, 1L, idx, s"$root/ckpt", "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("refusing to overwrite"))
    assert(Ivf.open(spark, idx).assigned.count() === 96,
      "foreign batch must survive the refused stream batch")
  }

  test("existingBatchIds sees batch_id at any partition depth (payload layout)") {
    val root = Files.createTempDirectory("idxdepth").toString
    val idx = s"$root/ivfp"
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i), (i % 2).toString))
      .toDF("vec_id", "embedding", "lang")
    // payload-partitioned store: cells nest lang=*/cell=*/batch_id=* —
    // a fixed-depth glob would report NO batch ids here and let a fresh
    // stream overwrite batch 1
    Ivf.write(Ivf.build(base, nCells = 3, payload = Seq("lang")), idx,
      partitionPayload = Seq("lang"))
    val manual = (for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i), "0"))
      .toDF("vec_id", "embedding", "lang")
    Ivf.append(manual, idx, 4L, "vec_id", "embedding")
    assert(StreamBinding.existingBatchIds(spark, s"$idx/cells") === Set(0L, 4L))
  }

  test("crash between append and bookkeeping: replay reads as our own batch") {
    val root = Files.createTempDirectory("idxcrash").toString
    val idx = s"$root/ivf"; val ckpt = s"$root/ckpt"
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.write(Ivf.build(base, nCells = 3), idx)

    val b0 = (for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    IndexIngest.ivfBatch(b0, 0L, idx, ckpt, "vec_id", "embedding")

    // batch 1 crashes AFTER the physical append but BEFORE any post-append
    // bookkeeping: resolve + append only, no recordWritten
    val b1 = (for (axis <- Seq(0, 3, 6); i <- 25 until 30)
      yield ((2000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    val id = StreamBinding.resolveAppendId(spark, ckpt, idx, s"$idx/cells", 1L)
    Ivf.append(b1, idx, id, "vec_id", "embedding")

    // the engine replays streaming batch 1: the half-committed partition
    // must be recognized as ours and idempotently replaced — not
    // misdiagnosed as a foreign writer (which would wedge the stream)
    IndexIngest.ivfBatch(b1, 1L, idx, ckpt, "vec_id", "embedding")
    assert(Ivf.open(spark, idx).assigned.count() === 90,
      "replayed half-committed batch must replace, not duplicate or wedge")
  }

  test("checkpoint token lives under the checkpoint dir; binding writes are atomic") {
    val root = Files.createTempDirectory("idxtoken").toString
    val idx = s"$root/ivf"; val ckpt = s"$root/ckpt"
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.write(Ivf.build(base, nCells = 3), idx)
    val b0 = (for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    IndexIngest.ivfBatch(b0, 0L, idx, ckpt, "vec_id", "embedding")
    IndexIngest.ivfBatch(
      (for (axis <- Seq(0, 3, 6); i <- 25 until 30)
        yield ((2000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding"),
      1L, idx, ckpt, "vec_id", "embedding")

    // the token identifies the CHECKPOINT lineage, so it must live (and be
    // resolved) under the checkpoint dir — on the checkpoint's filesystem
    assert(Files.exists(java.nio.file.Paths.get(ckpt, "graft_stream_token")))
    // binding under the index store, published atomically: no torn temp
    // files left behind, content fully parseable after repeated overwrites
    val bindingDir = new java.io.File(idx)
    assert(!bindingDir.listFiles.map(_.getName).exists(_.endsWith(".tmp")),
      "atomic temp+rename must not leave temp files")
    val binding = Files.readString(java.nio.file.Paths.get(idx, "_stream_binding"))
    assert(binding.contains("token=") && binding.contains("base=") &&
      binding.contains("max_written="), s"unparseable binding: $binding")
  }

  test("streams micro-batches into a persisted IVF-PQ index; coded store grows") {
    val root = Files.createTempDirectory("ivfpqingest").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val idx = s"$root/ivfpq"; val ckpt = s"$root/ckpt"
    val base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
      yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    graft.operators.IvfPq.write(
      graft.operators.IvfPq.build(base, nCells = 3, m = 4, kc = 16,
        dim = 8, trainSample = 200), idx)

    writeVecJson(in, "b1.json",
      for (axis <- Seq(0, 3, 6); i <- 20 until 25)
        yield (1000 + axis * 100 + i).toLong -> v(axis, i))
    IndexIngest.runIvfPq(spark, in, vecSchema, idx, ckpt)

    val opened = graft.operators.IvfPq.open(spark, idx)
    assert(opened.coded.count() === 75)
    // a streamed row is findable through the persisted coded store
    val probe = Seq((9999L, v(3, 24))).toDF("vec_id", "embedding")
    val got = graft.operators.IvfPq
      .query(opened, probe, k = 3, nProbe = 1, shortlist = 25)
      .select("n_id").as[Long].collect().toSet
    assert(got.exists(id => id >= 1320L && id <= 1324L),
      s"expected a streamed axis-3 vector among the neighbors, got $got")
    // replay with no new files appends nothing
    IndexIngest.runIvfPq(spark, in, vecSchema, idx, ckpt)
    assert(graft.operators.IvfPq.open(spark, idx).coded.count() === 75)
  }

  test("streams documents into a persisted BM25 index; ranking equals a batch rebuild") {
    val root = Files.createTempDirectory("bm25ingest").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val idx = s"$root/bm25"; val ckpt = s"$root/ckpt"
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    val d = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a quick brown dog runs across the plain",
      3L -> "the lazy cat sleeps on the plain all day",
      4L -> "foxes and dogs are quick animals of the plain",
      5L -> "nothing in common with the others at all")
    Bm25.write(Bm25.buildIndex(
      d.take(3).toDF("doc_id", "text"), "doc_id", "text"), idx)

    val lines = d.drop(3).map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
    Files.write(java.nio.file.Paths.get(in, "b1.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    IndexIngest.runBm25(spark, in, docSchema, idx, ckpt, "doc_id", "text")

    val qs = Seq((10L, "quick brown dog"), (11L, "the plain")).toDF("q_id", "q_text")
    val streamed = Bm25.topKIndexed(Bm25.open(spark, idx), qs, "q_id", "q_text", k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    val rebuilt = Bm25.topKIndexed(Bm25.buildIndex(
        d.toDF("doc_id", "text"), "doc_id", "text"), qs, "q_id", "q_text", k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    assert(streamed == rebuilt,
      "streamed appends must reproduce the batch-built index exactly")
  }

  test("streams documents into a persisted gram index; incremental report equals full") {
    val root = Files.createTempDirectory("gramingest").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val idx = s"$root/grams"; val ckpt = s"$root/ckpt"
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    val corpus = Seq(1L -> "a b c d e f", 2L -> "p q r s t u")
    val streamedDocs = Seq(3L -> "g h i j k l", 4L -> "m n o v w x")
    graft.operators.SubstringDedup.buildIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text", k = 3, idx)
    Files.write(java.nio.file.Paths.get(in, "b1.json"),
      streamedDocs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
        .mkString("\n").getBytes("UTF-8"))
    IndexIngest.runGrams(spark, in, docSchema, idx, ckpt, "doc_id", "text")

    // the probe batch shares "c d e" with the base corpus and "h i j" with
    // a STREAMED doc — the second is visible only if the stream landed
    val batch = Seq(10L -> "z1 c d e z2", 11L -> "z3 h i j z4", 12L -> "z5 z6 z7 z8")
      .toDF("doc_id", "text")
    val inc = graft.operators.SubstringDedup
      .reportAgainst(spark, idx, batch, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val full = graft.operators.SubstringDedup
      .report((corpus ++ streamedDocs).toDF("doc_id", "text").union(batch),
        "doc_id", "text", k = 3)
      .where(col("doc_id") >= 10L).orderBy("doc_id").collect().toSeq
    assert(inc === full)
    val m = inc.map(r => r.getLong(0) -> r.getAs[Long]("covered_tokens")).toMap
    assert(m(10L) === 3L && m(11L) === 3L && m(12L) === 0L)
    // replay with no new files appends nothing: counts unchanged at minDocs=3
    IndexIngest.runGrams(spark, in, docSchema, idx, ckpt, "doc_id", "text")
    val strict = graft.operators.SubstringDedup
      .reportAgainst(spark, idx, batch, "doc_id", "text", minDocs = 3)
      .agg(sum("covered_tokens")).head.getLong(0)
    assert(strict === 0L, "a replayed empty stream must not double-count")
  }

  test("streaming clean loop: batches clean against the store AND each other") {
    val root = Files.createTempDirectory("gramclean").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val idx = s"$root/grams"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    graft.operators.SubstringDedup.buildIndex(
      Seq(1L -> "a b c d e f").toDF("doc_id", "text"), "doc_id", "text", k = 3, idx)

    // batch 1: doc 10 quotes the corpus ("c d e" cut); doc 11 is fresh
    Files.write(java.nio.file.Paths.get(in, "b1.json"),
      Seq("""{"doc_id":10,"text":"x1 c d e x2"}""",
          """{"doc_id":11,"text":"fresh span here x3"}""")
        .mkString("\n").getBytes("UTF-8"))
    IndexIngest.runGramsClean(spark, in, docSchema, idx, out, ckpt, "doc_id", "text")
    // batch 2: doc 20 repeats batch 1's "fresh span here" — visible only
    // because batch 1's RAW grams were folded into the store
    Files.write(java.nio.file.Paths.get(in, "b2.json"),
      Seq("""{"doc_id":20,"text":"y1 fresh span here y2"}""")
        .mkString("\n").getBytes("UTF-8"))
    IndexIngest.runGramsClean(spark, in, docSchema, idx, out, ckpt, "doc_id", "text")

    val cleaned = spark.read.parquet(out)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(cleaned(10L) === "x1 x2")
    assert(cleaned(11L) === "fresh span here x3") // untouched in ITS batch
    assert(cleaned(20L) === "y1 y2") // cut against batch 1's memory
    // replay with no new files changes nothing
    IndexIngest.runGramsClean(spark, in, docSchema, idx, out, ckpt, "doc_id", "text")
    assert(spark.read.parquet(out).count() === 3)
  }

  test("crash-replay of gramsCleanBatch: a batch never cleans against its own grams") {
    val root = Files.createTempDirectory("gramcrash").toString
    val idx = s"$root/grams"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(ckpt))
    graft.operators.SubstringDedup.buildIndex(
      Seq(1L -> "a b c d e f").toDF("doc_id", "text"), "doc_id", "text", k = 3, idx)

    // doc 10 quotes the corpus ("c d e" cut); doc 11 shares nothing with it
    val batch = Seq(10L -> "x1 c d e x2", 11L -> "novel words appear here only")
      .toDF("doc_id", "text")
    IndexIngest.gramsCleanBatch(batch, 0L, idx, out, ckpt, "doc_id", "text")
    val first = spark.read.parquet(out)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(first(10L) === "x1 x2")
    assert(first(11L) === "novel words appear here only")

    // the crash window: appendIndex landed (the store now holds the batch's
    // own grams at its append id) but the checkpoint never committed, so
    // the engine re-runs the SAME micro-batch. The replayed clean must read
    // the store as it was BELOW the batch's append id — an unbounded scan
    // would find every batch gram already present (store 1 + batch 1 >=
    // minDocs 2) and cut essentially all text, then dynamic-overwrite the
    // previously correct partition
    IndexIngest.gramsCleanBatch(batch, 0L, idx, out, ckpt, "doc_id", "text")
    val replayed = spark.read.parquet(out)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(replayed === first,
      s"crash-replay over-cut against the batch's own grams: $replayed")
    // and the gram append itself stayed idempotent: one contribution row
    // per (gram, batch) — a gram the corpus also holds legitimately has a
    // batch-0 row AND an append row, but never two rows in the same batch
    val perGram = spark.read.parquet(s"$idx/grams")
      .groupBy("__h", "batch_id").count().agg(max("count")).head.getLong(0)
    assert(perGram === 1L, "replayed append duplicated gram contributions")
  }

  test("streams documents into a persisted winnow store; overlap sees them") {
    val root = Files.createTempDirectory("winingest").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val idx = s"$root/fps"; val ckpt = s"$root/ckpt"
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // shared runs of k+w-1 = 8 tokens — the winnowing guarantee length
    val runA = "a1 a2 a3 a4 a5 a6 a7 a8"
    val runB = "b1 b2 b3 b4 b5 b6 b7 b8"
    val corpus = Seq(1L -> s"$runA f1 f2 f3 f4 f5 f6 f7",
      2L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    val streamedDocs = Seq(3L -> s"g1 g2 g3 g4 $runB g5 g6")
    graft.operators.Winnow.write(
      corpus.toDF("doc_id", "text"), "doc_id", "text", idx)
    Files.write(java.nio.file.Paths.get(in, "b1.json"),
      streamedDocs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
        .mkString("\n").getBytes("UTF-8"))
    IndexIngest.runWinnow(spark, in, docSchema, idx, ckpt, "doc_id", "text")

    // probe shares runA with the base corpus and runB with a STREAMED doc
    val batch = Seq(10L -> s"z1 z2 $runA z3",
      11L -> s"z4 $runB z5 z6", 12L -> "z7 z8 z9 z10 z11 z12 z13 z14")
      .toDF("doc_id", "text")
    val got = graft.operators.Winnow.overlapAgainst(
        graft.operators.Winnow.open(spark, idx), batch, "doc_id", "text",
        minShared = 1)
      .where(col("kind") === "new_old")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((10L, 1L)), s"base-corpus overlap missing: $got")
    assert(got.contains((11L, 3L)), s"streamed-doc overlap missing: $got")
    assert(!got.exists(_._1 == 12L), s"unrelated doc flagged: $got")
    // replay with no new files appends nothing
    IndexIngest.runWinnow(spark, in, docSchema, idx, ckpt, "doc_id", "text")
    val rows = spark.read.parquet(s"$idx/fps")
      .groupBy("id", "h").count().agg(max("count")).head.getLong(0)
    assert(rows === 1L, "replayed empty stream duplicated fingerprint rows")
  }
}
