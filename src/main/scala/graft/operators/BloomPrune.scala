package graft.operators

import graft.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a Bloom filter of the BUILD side's keys
  * (one narrow aggregation), broadcast its bytes, and drop probe rows whose
  * key cannot match BEFORE the probe side shuffles. The manual, composable
  * form of runtime row-level filtering (cf. Spark's
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, which only fires
  * under specific plan shapes): at 100 TB the win is that non-matching
  * probe rows never leave their input partition — with a selective build
  * side, shuffle volume drops to ≈ the matching fraction plus the false-
  * positive rate.
  *
  * `mightJoin` alone can keep false positives (rate ≈ (1−e^(−kn/m))^k);
  * compose with the real join ([[prunedJoin]]) for exact results — the
  * filter can never drop a true match (no false negatives).
  */
object BloomPrune {

  /** Probe rows whose `probeKey` might appear among `build`'s `buildKey`s.
    * Default geometry: 2²³ bits (1 MiB) / 5 hashes ≈ 1% FP at 1M build keys.
    */
  def mightJoin(probe: DataFrame, build: DataFrame,
                probeKey: String, buildKey: String,
                numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    GraftFunctions.register(probe.sparkSession)
    val bloom = build.agg(call_function("graft_bloom_agg",
      col(buildKey), lit(numBits), lit(numHashes)).as("__bloom"))
    // broadcast the one-row bloom; the probe side stays un-shuffled
    probe.crossJoin(broadcast(bloom))
      .where(call_function("graft_bloom_contains", col("__bloom"), col(probeKey)))
      .drop("__bloom")
  }

  /** Exact inner equi-join with the probe side Bloom-pruned first: the
    * filter passes every true match (no false negatives) and the join then
    * eliminates the false positives, so the result equals
    * `probe.join(build, probe(probeKey) === build(buildKey))` exactly —
    * with the big side's shuffle shrunk to the surviving rows.
    */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    val pruned = mightJoin(probe, build, probeKey, buildKey, numBits, numHashes)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
