package graft.pipeline

import graft.SparkSpec
import graft.operators.{Bm25, Ivf}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IndexVersionsSpec extends SparkSpec {
  import spark.implicits._

  private def v(axis: Int, i: Int): Array[Float] = {
    val a = Array.fill(8)(0.02f * ((i * 7) % 5))
    a(axis) = 1.0f + 0.01f * i
    a
  }

  private def base = (for (axis <- Seq(0, 3, 6); i <- 0 until 20)
    yield ((axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")

  test("publish seals versions in order; latest skips unsealed crash debris") {
    val root = Files.createTempDirectory("idxver").toString
    assert(IndexVersions.latest(spark, root).isEmpty)
    val v0 = IndexVersions.publish(spark, root)(p =>
      Ivf.write(Ivf.build(base, nCells = 3), p))
    assert(v0.endsWith("/v0") && IndexVersions.latest(spark, root).contains(v0))
    // a crashed build: throws before sealing — latest must stay v0, and
    // the debris version number is burned, not reused
    intercept[RuntimeException] {
      IndexVersions.publish(spark, root) { p =>
        Ivf.write(Ivf.build(base.limit(5), nCells = 2), p)
        throw new RuntimeException("simulated crash before seal")
      }
    }
    assert(IndexVersions.latest(spark, root).contains(v0))
    val v2 = IndexVersions.publish(spark, root)(p =>
      Ivf.write(Ivf.build(base, nCells = 3), p))
    assert(v2.endsWith("/v2"), s"crash debris v1 must burn its number: $v2")
    assert(IndexVersions.latest(spark, root).contains(v2))
  }

  test("compactLatest seals a successor answering identically; old version intact") {
    val root = Files.createTempDirectory("idxverc").toString
    val v0 = IndexVersions.publish(spark, root)(p =>
      Ivf.write(Ivf.build(base, nCells = 3), p))
    // daily appends land on the current sealed version's store
    val batch = (for (axis <- Seq(0, 3, 6); i <- 20 until 25)
      yield ((1000 + axis * 100 + i).toLong, v(axis, i))).toDF("vec_id", "embedding")
    Ivf.append(batch, v0, batchId = 1)
    val v1 = IndexVersions.compactLatest(spark, root)(Ivf.compactTo(spark, _, _))
    assert(IndexVersions.latest(spark, root).contains(v1))
    val probe = batch.where("vec_id = 1024")
    def ans(p: String) = Ivf.query(Ivf.open(spark, p), probe, k = 3, nProbe = 1)
      .select("n_id", "sim").as[(Long, Double)].collect().toSet
    assert(ans(v1) === ans(v0), "compacted successor must answer identically")
    // rollback path: the pre-compaction version still resolves and answers
    assert(IndexVersions.versions(spark, root, sealedOnly = true)
      .map(_._1) === Seq(0L, 1L))
  }

  test("works for BM25 stores (multi-sub-dataset tree)") {
    val root = Files.createTempDirectory("idxverb").toString
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a quick brown dog runs across the plain",
      3L -> "the lazy cat sleeps on the plain all day").toDF("doc_id", "text")
    val v0 = IndexVersions.publish(spark, root)(p =>
      Bm25.write(Bm25.buildIndex(docs, "doc_id", "text"), p))
    val qs = Seq((10L, "quick brown dog")).toDF("q_id", "q_text")
    val hits = Bm25.topKIndexed(Bm25.open(spark, v0), qs, "q_id", "q_text", k = 2)
    assert(hits.count() === 2)
    val v1 = IndexVersions.compactLatest(spark, root)(Bm25.compactTo(spark, _, _))
    assert(Bm25.topKIndexed(Bm25.open(spark, v1), qs, "q_id", "q_text", k = 2)
      .orderBy("q_id", "rank").collect().toSeq ===
      hits.orderBy("q_id", "rank").collect().toSeq)
  }
}
