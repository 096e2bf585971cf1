package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diversity-preserving subsampling (the second half of D4, Tirumala et al.
  * 2023, arXiv:2308.12284: dedup, then DIVERSIFY): k-means-cluster the
  * embedding space and sample each cluster toward a quota in deterministic
  * pseudo-random order. A plain uniform sample reproduces the corpus's mode
  * imbalance — dominant clusters (boilerplate-adjacent web text) crowd out
  * the tail; cluster-balanced quotas keep the tail modes represented, which
  * is the measured win of the D4 recipe. Compose after [[SemDedup]] for the
  * full method.
  *
  * Quotas come in two flavors:
  *   - `perCluster`: a flat per-cluster cap (the D4 shape);
  *   - [[temperatureQuotas]]: `quota_c ∝ size_c^α` via
  *     [[Mix.temperatureBudgets]] over the cluster masses — α = 1 is
  *     proportional (≈ uniform sampling), α → 0 approaches flat, in
  *     between is the same knob the source-mix uses.
  *
  * Determinism: admission order within a cluster is `xxhash64(id)` — a
  * fixed pseudo-random permutation, so the same corpus always yields the
  * same sample ("unbiased-looking" without an RNG, [[Mix.capTokens]]'s
  * md5-order convention). 64-bit ties are theoretically possible and would
  * make the order of that one colliding pair unspecified; at a ~5·10^-20
  * per-pair rate this is below any other nondeterminism in the stack.
  *
  * Scale shape: cluster assignment is [[Ivf.build]]'s one
  * broadcast-centroid pass over the corpus; admission is
  * [[Mix.capTokens]]'s range-sliced parallel prefix sums keyed on
  * `(cluster, slice)` — never one unsplittable task per cluster.
  */
object DiversitySample {

  /** `(idCol, cell)` — the k-means assignment; the deterministic admission
    * key is derived where it is used (the `*From` entry points).
    */
  private def assigned(df: DataFrame, idCol: String, vecCol: String,
                       nClusters: Int, trainSample: Int, seed: Long): DataFrame =
    Ivf.build(df, nClusters, id = idCol, vec = vecCol,
        trainSample = trainSample, seed = seed)
      .assigned
      .select(col("id").as(idCol), col("cell"))

  /** Flat cluster-balanced sample: up to `perCluster` ids from each of
    * `nClusters` k-means cells. Returns `(idCol, cell)` — join back on the
    * id for the surviving rows.
    */
  def clusterBalanced(df: DataFrame, idCol: String, vecCol: String,
                      nClusters: Int, perCluster: Long,
                      trainSample: Int = 100000, seed: Long = 42L): DataFrame =
    clusterBalancedFrom(
      assigned(df, idCol, vecCol, nClusters, trainSample, seed), idCol, perCluster)

  /** [[clusterBalanced]] from a PRE-COMPUTED `(idCol, cell)` assignment —
    * the pay-the-clustering-once path: a persisted [[Ivf]] store's
    * `assigned` frame (or any clustering output) samples without
    * retraining, so repeated draws (new quota, new α) cost only the
    * admission pass.
    */
  def clusterBalancedFrom(assignment: DataFrame, idCol: String,
                          perCluster: Long): DataFrame = {
    require(perCluster > 0, s"perCluster > 0: $perCluster")
    val a = assignment.select(col(idCol), col("cell"),
      xxhash64(col(idCol)).as("__ord"))
    val budgets = a.select("cell").distinct()
      .withColumn("budget", lit(perCluster))
    Mix.capTokens(a.withColumn("__one", lit(1L)), "cell", "__ord", "__one", budgets)
      .select(col(idCol), col("cell"))
  }

  /** Temperature-scaled cluster quotas: `quota_c ∝ size_c^α`, total
    * `budget` rows — [[Mix.temperatureBudgets]] over cluster masses with
    * unit weights, then the same deterministic admission.
    */
  def temperatureQuotas(df: DataFrame, idCol: String, vecCol: String,
                        nClusters: Int, alpha: Double, budget: Long,
                        trainSample: Int = 100000, seed: Long = 42L): DataFrame =
    temperatureQuotasFrom(
      assigned(df, idCol, vecCol, nClusters, trainSample, seed), idCol, alpha, budget)

  /** [[temperatureQuotas]] from a pre-computed `(idCol, cell)` assignment —
    * the same pay-the-clustering-once path as [[clusterBalancedFrom]], so
    * sweeping α over a persisted store costs only admission passes.
    */
  def temperatureQuotasFrom(assignment: DataFrame, idCol: String,
                            alpha: Double, budget: Long): DataFrame = {
    val a = assignment.select(col(idCol), col("cell"),
      xxhash64(col(idCol)).as("__ord"), lit(1L).as("__one"))
    val budgets = Mix.temperatureBudgets(a, "cell", "__one", alpha, budget)
    Mix.capTokens(a, "cell", "__ord", "__one",
        budgets.select(col("cell"), col("budget")))
      .select(col(idCol), col("cell"))
  }
}
