package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated axis clusters; each doc adds a distinct secondary
  // direction so WITHIN a cluster cosine stays <= ~0.9975 (same secondary
  // coordinate, different magnitude: angle(atan .6, atan .7) ~ 4deg) —
  // comfortably under tau=0.999, while an injected copy nudged by 0.001 on
  // an unused coordinate sits at cosine ~0.9999996
  private def v(axis: Int, i: Int, nudge: Float = 0f): Array[Float] = {
    val a = Array.fill(8)(0f)
    a(axis) = 1.0f
    a((axis + 1 + (i % 5)) % 8) += 0.6f + 0.1f * (i % 3)
    a((axis + 6) % 8) += nudge
    a
  }

  private def corpus() = {
    val originals = for (axis <- Seq(0, 2, 4); i <- 0 until 10)
      yield ((axis * 100 + i).toLong, v(axis, i))
    // a near-parallel copy of every 5th doc
    val dups = for (axis <- Seq(0, 2, 4); i <- Seq(0, 5))
      yield ((10000 + axis * 100 + i).toLong, v(axis, i, nudge = 0.001f))
    (originals ++ dups).toDF("vec_id", "embedding")
  }

  test("prune keeps min-id reps; injected near-parallel copies are pruned") {
    val pruned = SemDedup.prune(corpus(), nClusters = 3, tau = 0.999)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(pruned.size === 36)
    // every injected copy is dropped and points at its original
    for (axis <- Seq(0, 2, 4); i <- Seq(0, 5)) {
      val (rep, keep) = pruned((10000 + axis * 100 + i).toLong)
      assert(!keep && rep === (axis * 100 + i).toLong,
        s"copy of ${axis * 100 + i}: rep=$rep keep=$keep")
    }
    // every original survives as its own rep
    for (axis <- Seq(0, 2, 4); i <- 0 until 10) {
      val (rep, keep) = pruned((axis * 100 + i).toLong)
      assert(keep && rep === (axis * 100 + i).toLong)
    }
  }

  test("pairs are exact within a cluster and only above tau") {
    val assigned = Ivf.build(corpus(), nCells = 3).assigned
    val p = SemDedup.pairs(assigned, tau = 0.999).collect()
    assert(p.length === 6, s"expected the 6 injected pairs, got ${p.length}")
    assert(p.forall(_.getDouble(3) >= 0.999))
    assert(p.forall { r =>
      r.getLong(2) - r.getLong(1) === 10000L }, // (original, its copy)
      "only original->copy pairs should clear tau")
  }

  test("oversized clusters are excluded from the pairwise stage") {
    val assigned = Ivf.build(corpus(), nCells = 3).assigned
    // cap below the cluster size of 12 -> no cluster may pair
    assert(SemDedup.pairs(assigned, tau = 0.999, maxClusterSize = 5).count() === 0)
  }

  test("skippedClusters surfaces exactly the capped clusters and doc totals") {
    val assigned = Ivf.build(corpus(), nCells = 3).assigned
    // skewed fixture: each of the 3 clusters holds 12 docs; cap at 5 skips
    // all of them, and the report must say so — cluster by cluster plus
    // the affected-doc total an operator actually monitors
    val skipped = SemDedup.skippedClusters(assigned, maxClusterSize = 5)
      .select("cell", "n_docs", "n_docs_skipped_total", "n_clusters_skipped")
      .as[(Int, Long, Long, Long)].collect()
    assert(skipped.length === 3)
    assert(skipped.forall { case (_, n, tot, k) => n === 12L && tot === 36L && k === 3L })
    // a cap nothing hits reports nothing
    assert(SemDedup.skippedClusters(assigned, maxClusterSize = 1000).count() === 0)
  }

  test("tuneClusters follows k ~ sqrt(n) with clamps") {
    assert(SemDedup.tuneClusters(1000000L) === 1000)
    assert(SemDedup.tuneClusters(100L) === 10)
    assert(SemDedup.tuneClusters(1L) === 2) // floor
    assert(SemDedup.tuneClusters(Long.MaxValue >> 8, maxK = 4096) === 4096) // ceiling
  }

  test("transitive duplicate chains collapse to one min-id group") {
    // a -- b and b -- c are near-dup pairs; a -- c may or may not clear tau,
    // but the closure must put all three in one group either way
    val base = v(0, 0)
    def nudged(coord: Int, eps: Float): Array[Float] = {
      val a = base.clone(); a(coord) += eps; a
    }
    val chain = Seq(
      1L -> base, 2L -> nudged(1, 0.0005f), 3L -> nudged(2, 0.0005f)) ++
      (for (i <- 0 until 10) yield (100 + i).toLong -> v(4, i))
    val pruned = SemDedup.prune(chain.toDF("vec_id", "embedding"),
        nClusters = 2, tau = 0.999)
      .where(col("vec_id") <= 3L)
      .select("vec_id", "rep", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(pruned === Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
  }
}
