package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): k-means the embedding space, detect near-duplicates
  * ONLY within each cluster (cosine >= tau on L2-normalized vectors),
  * close the near-dup pairs into duplicate groups, and keep one canonical
  * representative (min id) per group.
  *
  * This is the published recipe for semantic dedup of LLM training
  * corpora, and the clustering IS the scale story: the quadratic pair
  * search is local to a cluster, so candidate work is sum(|c_i|^2) ~ n^2/k
  * instead of n^2, the pairwise stage shuffles on `cell` only, and
  * oversized clusters are excluded by `maxClusterSize` (same cap contract
  * as [[TextDedup.minHashCandidates]]'s LSH buckets — one dense region
  * must never quadratically blow up the join; raise nClusters instead).
  * Training reuses [[Ivf.build]]'s bounded driver-side seeded k-means++,
  * and the duplicate-group closure is [[ConnectedComponents]] over the
  * near-dup edge set, which is tiny relative to the corpus (only pairs
  * above tau survive). Cross-cluster near-dups are missed BY DESIGN —
  * SemDeDup's accepted recall/speed trade, tuned via nClusters.
  *
  * Differs from [[Knn.cosineNearDup]] (hyperplane-LSH buckets): LSH
  * buckets are recall-probabilistic per pair, while SemDeDup is EXACT
  * within a cluster — the miss set is exactly the cross-cluster pairs.
  */
object SemDedup {

  /** Within-cluster near-duplicate pairs `(cell, id_a, id_b, sim)` with
    * cosine >= tau; `assigned` is [[Ivf.build]]'s `(id, emb, cell)` shape.
    * Clusters above `maxClusterSize` are dropped from the pairwise stage.
    */
  def pairs(assigned: DataFrame, tau: Double,
            maxClusterSize: Int = 10000): DataFrame = {
    graft.GraftFunctions.register(assigned.sparkSession)
    val n = assigned.select(col("id"), col("cell"),
      normalizeFast(col("emb")).as("nvec"))
    val bounded = Caps.capGroupSize(n, maxClusterSize, "cell")
    val a = bounded.select(col("cell"), col("id").as("id_a"), col("nvec").as("va"))
    val b = bounded.select(col("cell"), col("id").as("id_b"), col("nvec").as("vb"))
    a.join(b, Seq("cell")).where(col("id_a") < col("id_b"))
      .withColumn("sim", round(dotFast(col("va"), col("vb")), 6))
      .where(col("sim") >= tau)
      .select("cell", "id_a", "id_b", "sim")
  }

  /** Observability for the `maxClusterSize` cap (the [[Ivf.cellStats]]
    * analogue): one row per OVERSIZED cluster — `(cell, n_docs)` — plus a
    * broadcast total of affected docs, so an operator can see how much of
    * the corpus the pairwise stage silently skipped instead of discovering
    * it from recall loss. Empty result = no cluster hit the cap.
    */
  def skippedClusters(assigned: DataFrame,
                      maxClusterSize: Int = 10000): DataFrame = {
    val over = assigned.groupBy("cell").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > maxClusterSize)
    over.crossJoin(broadcast(
        over.agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs_skipped_total"),
          count(lit(1)).as("n_clusters_skipped"))))
      .orderBy("cell")
  }

  /** k ∝ √n cluster-count rule (the SemDeDup paper's shape: expected
    * cluster size n/k = √n keeps per-cluster quadratic work at n^1.5
    * total, the standard budget). Clamped to [2, maxK]; callers with a
    * known dense region should raise k beyond this, not the cap.
    */
  def tuneClusters(n: Long, maxK: Int = 1 << 20): Int =
    math.min(maxK.toLong, math.max(2L, math.round(math.sqrt(n.toDouble)))).toInt

  /** Cluster → pair → close → choose: one row per input doc,
    * `(<id>, cell, rep, keep)` — `rep` is the min id of the doc's duplicate
    * group (its own id when it has no near-dup), `keep` = (id == rep).
    * Deterministic end to end: seeded k-means++, exact within-cluster
    * cosine, min-id closure.
    */
  def prune(corpus: DataFrame, nClusters: Int, tau: Double,
            id: String = "vec_id", vec: String = "embedding",
            trainSample: Int = 100000, seed: Long = 42L,
            maxClusterSize: Int = 10000): DataFrame = {
    val spark = corpus.sparkSession
    val assigned = Ivf.build(corpus, nClusters, id, vec, trainSample, seed)
      .assigned
    val p = pairs(assigned, tau, maxClusterSize)
    val reps = ConnectedComponents.components(spark,
      assigned.select("id"), p, idCol = "id", aCol = "id_a", bCol = "id_b",
      assumeEdgesClosed = true) // pairs derive from assigned — closed
    assigned.select("id", "cell").join(reps, Seq("id"))
      .select(col("id").as(id), col("cell"), col("component").as("rep"),
        (col("id") === col("component")).as("keep"))
  }
}
