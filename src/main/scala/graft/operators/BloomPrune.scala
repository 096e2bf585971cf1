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
    *
    * The bloom is computed EAGERLY (one job over the build side) and
    * embedded as a literal — the same shape as Spark's own runtime filters,
    * which inject the built filter as a plan-time scalar. Embedding matters:
    * read as a broadcast-joined COLUMN instead, every row access copies the
    * binary out of its UnsafeRow, so the per-task deserialization memo in
    * `graft_bloom_contains` (which keys on array identity) never hits and
    * the filter re-parses 1 MiB per probe row; a literal hands every row
    * the same array instance. Measured: 313 s → sub-second on a 600k-row
    * probe at the default geometry.
    */
  def mightJoin(probe: DataFrame, build: DataFrame,
                probeKey: String, buildKey: String,
                numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    GraftFunctions.register(probe.sparkSession)
    val bloomBytes = build.agg(call_function("graft_bloom_agg",
        col(buildKey), lit(numBits), lit(numHashes)).as("__bloom"))
      .head.getAs[Array[Byte]](0)
    probe.where(call_function("graft_bloom_contains", lit(bloomBytes), col(probeKey)))
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
