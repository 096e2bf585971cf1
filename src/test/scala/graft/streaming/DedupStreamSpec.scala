package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class DedupStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeJson(dir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    val lines = rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("admits unique docs, rejects dups vs the index and within a batch, survives re-runs") {
    val root = Files.createTempDirectory("dedupstream").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val idx = s"$root/index"; val out = s"$root/out"; val ckpt = s"$root/ckpt"

    // batch 1: two uniques + an exact within-batch dup of doc 1
    writeJson(in, "b1.json", Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "completely different content about distributed query engines",
      3L -> "the quick brown fox jumps over the lazy dog tonight"))
    DedupStream.run(spark, in, schema, idx, out, ckpt, "doc_id", "text")
    val after1 = DedupStream.admitted(spark, out)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(after1 == Set(1L, 2L), s"keep-first within batch, got $after1")

    // batch 2: a dup of an ADMITTED doc (cross-batch, via the index),
    // plus a fresh unique
    writeJson(in, "b2.json", Seq(
      10L -> "completely different content about distributed query engines",
      11L -> "a genuinely novel document that matches nothing admitted before"))
    DedupStream.run(spark, in, schema, idx, out, ckpt, "doc_id", "text")
    val after2 = DedupStream.admitted(spark, out)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(after2 == Set(1L, 2L, 11L), s"10 rejected via the index, got $after2")

    // no new files: re-running the AvailableNow query changes nothing
    DedupStream.run(spark, in, schema, idx, out, ckpt, "doc_id", "text")
    val after3 = DedupStream.admitted(spark, out)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(after3 == after2)

    // the index holds band rows ONLY for admitted docs
    val indexed = spark.read.parquet(s"$idx/buckets")
      .select("id").distinct()
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(indexed == Set(1L, 2L, 11L))
  }

  test("a retried batch (same batchId, bands already written) keeps its docs") {
    val root = Files.createTempDirectory("dedupretry").toString
    val idx = s"$root/index"; val out = s"$root/out"

    val b0 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "the quick brown fox jumps over the lazy dog tonight"),
        org.apache.spark.sql.Row(2L, "completely different content about distributed query engines"))),
      schema)
    DedupStream.processBatch(b0, 0L, idx, out, "doc_id", "text")
    val first = DedupStream.admitted(spark, out)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(first == Set(1L, 2L))

    // Crash between the bands write and the checkpoint commit ⇒ Spark
    // replays batch 0. The index on disk already holds batch 0's band
    // rows; the replay must NOT treat them as prior corpus (every doc
    // would match itself and be dropped).
    DedupStream.processBatch(b0, 0L, idx, out, "doc_id", "text")
    val replayed = DedupStream.admitted(spark, out)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(replayed == Set(1L, 2L),
      s"replay of an uncommitted batch lost docs: $replayed")

    // and a genuinely NEW batch still dedups against batch 0 via the index
    val b1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(10L, "completely different content about distributed query engines"),
        org.apache.spark.sql.Row(11L, "a genuinely novel document that matches nothing admitted before"))),
      schema)
    DedupStream.processBatch(b1, 1L, idx, out, "doc_id", "text")
    val after = DedupStream.admitted(spark, out)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(after == Set(1L, 2L, 11L), s"cross-batch dedup broken: $after")
  }

  test("a colliding candidate below the Jaccard threshold is admitted") {
    val root = Files.createTempDirectory("dedupverify").toString
    val idx = s"$root/index"; val out = s"$root/out"
    // shared 8-token prefix, distinct tails: Jaccard ≈ 6/22 ≈ 0.27 — far
    // below the 0.8 threshold, but at 16 single-row bands the pair
    // collides with ~99% probability (asserted as a precondition below:
    // without a collision this test would pass vacuously)
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val t1 = shared + " iota kappa lambda mu nu xi omicron pi"
    val t2 = shared + " rho sigma tau upsilon phi chi psi omega"
    val b0 = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(org.apache.spark.sql.Row(1L, t1))), schema)
    DedupStream.processBatch(b0, 0L, idx, out, "doc_id", "text",
      rowsPerBand = 1)
    val b1 = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(2L, t2), // candidate, NOT a near-dup
      org.apache.spark.sql.Row(3L, t1)  // exact dup of admitted doc 1
    )), schema)
    val index = graft.operators.MinHashIndex.Index(
      spark.read.parquet(s"$idx/buckets"), 3, 16, 1)
    val candPairs = graft.operators.MinHashIndex
      .candidates(index, b1, "doc_id", "text")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candPairs.contains((2L, 1L)),
      s"precondition: (2,1) must band-collide, got $candPairs")
    DedupStream.processBatch(b1, 1L, idx, out, "doc_id", "text",
      rowsPerBand = 1)
    val after = DedupStream.admitted(spark, out)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(after == Set(1L, 2L),
      s"verification must admit the J<0.8 candidate and drop the exact dup: $after")
  }
}
