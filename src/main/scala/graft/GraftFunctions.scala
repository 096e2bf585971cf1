package graft

import graft.expressions._
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.SparkSession

/** Idempotent in-session registration of graft's native expressions —
  * complements `spark.sql.extensions=graft.GraftExtensions` for sessions
  * built without the config (e.g. a host harness passing us its session).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!spark.catalog.functionExists("graft_dot")) {
      reg.createOrReplaceTempFunction("graft_shingles",
        c => Shingles(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_shingles_all",
        c => Shingles(c(0), c(1), distinct = false), "internal")
      reg.createOrReplaceTempFunction("graft_minhash",
        c => MinHashSig(c(0), c(1), c(2)), "internal")
      reg.createOrReplaceTempFunction("graft_simhash",
        c => SimHash(c(0)), "internal")
      reg.createOrReplaceTempFunction("graft_gram_hashes",
        c => GramHashes(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_dot",
        c => DotProduct(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_l2norm",
        c => L2Normalize(c(0)), "internal")
      reg.createOrReplaceTempFunction("graft_cosine",
        c => CosineSim(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_hyperplane_lsh",
        c => HyperplaneLsh(c(0), c(1), c(2)), "internal")
      reg.createOrReplaceTempFunction("graft_minhash_merge",
        c => MinHashMergeAgg(c(0)).toAggregateExpression(), "internal")
      reg.createOrReplaceTempFunction("graft_kmin",
        c => TopKMinAgg(c(0), c(1)).toAggregateExpression(), "internal")
      reg.createOrReplaceTempFunction("graft_kll_quantiles",
        c => KllQuantilesAgg(c(0), c(1), c(2)).toAggregateExpression(), "internal")
      reg.createOrReplaceTempFunction("graft_kll_sketch",
        c => KllSketchAgg(c(0), c(1)).toAggregateExpression(), "internal")
      reg.createOrReplaceTempFunction("graft_kll_merge",
        c => KllMergeAgg(c(0)).toAggregateExpression(), "internal")
      reg.createOrReplaceTempFunction("graft_kll_value",
        c => KllValue(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_bucket",
        c => SearchSortedBucket(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_repetition",
        c => RepetitionStats(c(0)), "internal")
      reg.createOrReplaceTempFunction("graft_quantize8",
        c => Quantize8(c(0)), "internal")
      reg.createOrReplaceTempFunction("graft_dot_q8",
        c => DotQuantized(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_cms_sketch",
        c => CmsSketchAgg(c(0), c(1), c(2)).toAggregateExpression(), "internal")
      reg.createOrReplaceTempFunction("graft_cms_merge",
        c => CmsMergeAgg(c(0)).toAggregateExpression(), "internal")
      reg.createOrReplaceTempFunction("graft_cms_value",
        c => CmsValue(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_bloom_agg",
        c => BloomAgg(c(0), c(1), c(2)).toAggregateExpression(), "internal")
      reg.createOrReplaceTempFunction("graft_bloom_contains",
        c => BloomContains(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_normalize",
        c => NormalizeText(c(0)), "internal")
      reg.createOrReplaceTempFunction("graft_pq_encode",
        c => PqEncode(c(0), c(1)), "internal")
      reg.createOrReplaceTempFunction("graft_pq_adc",
        c => PqAdc(c(0), c(1)), "internal")
    }
  }
}
