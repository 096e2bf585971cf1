package graft

import graft.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native Catalyst expressions with the session, via
  * `spark.sql.extensions=graft.GraftExtensions`. After registration the
  * functions are callable from SQL and from Scala via
  * `functions.call_function("graft_*", ...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: String, arity: Int,
                 builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz, name),
      (children: Seq[Expression]) => {
        require(children.size == arity, s"$name expects $arity arguments")
        builder(children)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_shingles", classOf[Shingles].getName, 2,
      c => Shingles(c(0), c(1))))
    ext.injectFunction(fn("graft_shingles_all", classOf[Shingles].getName, 2,
      c => Shingles(c(0), c(1), distinct = false)))
    ext.injectFunction(fn("graft_minhash", classOf[MinHashSig].getName, 3,
      c => MinHashSig(c(0), c(1), c(2))))
    ext.injectFunction(fn("graft_simhash", classOf[SimHash].getName, 1,
      c => SimHash(c(0))))
    ext.injectFunction(fn("graft_gram_hashes", classOf[GramHashes].getName, 2,
      c => GramHashes(c(0), c(1))))
    ext.injectFunction(fn("graft_dot", classOf[DotProduct].getName, 2,
      c => DotProduct(c(0), c(1))))
    ext.injectFunction(fn("graft_l2norm", classOf[L2Normalize].getName, 1,
      c => L2Normalize(c(0))))
    ext.injectFunction(fn("graft_cosine", classOf[CosineSim].getName, 2,
      c => CosineSim(c(0), c(1))))
    ext.injectFunction(fn("graft_hyperplane_lsh", classOf[HyperplaneLsh].getName, 3,
      c => HyperplaneLsh(c(0), c(1), c(2))))
    ext.injectFunction(fn("graft_minhash_merge", classOf[MinHashMergeAgg].getName, 1,
      c => MinHashMergeAgg(c(0)).toAggregateExpression()))
    ext.injectFunction(fn("graft_kmin", classOf[TopKMinAgg].getName, 2,
      c => TopKMinAgg(c(0), c(1)).toAggregateExpression()))
    ext.injectFunction(fn("graft_kll_quantiles", classOf[KllQuantilesAgg].getName, 3,
      c => KllQuantilesAgg(c(0), c(1), c(2)).toAggregateExpression()))
    ext.injectFunction(fn("graft_kll_sketch", classOf[KllSketchAgg].getName, 2,
      c => KllSketchAgg(c(0), c(1)).toAggregateExpression()))
    ext.injectFunction(fn("graft_kll_merge", classOf[KllMergeAgg].getName, 1,
      c => KllMergeAgg(c(0)).toAggregateExpression()))
    ext.injectFunction(fn("graft_kll_value", classOf[KllValue].getName, 2,
      c => KllValue(c(0), c(1))))
    ext.injectFunction(fn("graft_bucket", classOf[SearchSortedBucket].getName, 2,
      c => SearchSortedBucket(c(0), c(1))))
    ext.injectFunction(fn("graft_repetition", classOf[RepetitionStats].getName, 1,
      c => RepetitionStats(c(0))))
    ext.injectFunction(fn("graft_quantize8", classOf[Quantize8].getName, 1,
      c => Quantize8(c(0))))
    ext.injectFunction(fn("graft_dot_q8", classOf[DotQuantized].getName, 2,
      c => DotQuantized(c(0), c(1))))
    ext.injectFunction(fn("graft_cms_sketch", classOf[CmsSketchAgg].getName, 3,
      c => CmsSketchAgg(c(0), c(1), c(2)).toAggregateExpression()))
    ext.injectFunction(fn("graft_cms_merge", classOf[CmsMergeAgg].getName, 1,
      c => CmsMergeAgg(c(0)).toAggregateExpression()))
    ext.injectFunction(fn("graft_cms_value", classOf[CmsValue].getName, 2,
      c => CmsValue(c(0), c(1))))
    ext.injectFunction(fn("graft_bloom_agg", classOf[BloomAgg].getName, 3,
      c => BloomAgg(c(0), c(1), c(2)).toAggregateExpression()))
    ext.injectFunction(fn("graft_bloom_contains", classOf[BloomContains].getName, 2,
      c => BloomContains(c(0), c(1))))
    ext.injectFunction(fn("graft_normalize", classOf[NormalizeText].getName, 1,
      c => NormalizeText(c(0))))
  }
}
