package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiversitySampleSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated modes with skewed sizes 60/30/10 — the imbalance
  // diversity sampling exists to correct. NB: k-means at k = #modes may
  // legitimately SPLIT the dominant mode instead of isolating the tail
  // (splitting 60 points cuts SSE more than separating 10 distant ones),
  // so quota assertions compare against the algorithm's own assignment
  // and the diversity claim uses k > #modes, the D4 practice.
  private def v(axis: Int, i: Int): Array[Float] = {
    val a = Array.fill(8)(0.02f * ((i * 7) % 5))
    a(axis) = 1.0f + 0.01f * i
    a
  }
  private def corpus = (
    (0 until 60).map(i => (i.toLong, v(0, i))) ++
    (0 until 30).map(i => (1000L + i, v(3, i))) ++
    (0 until 10).map(i => (2000L + i, v(6, i)))
  ).toDF("vec_id", "embedding")

  private def cellSizes(k: Int): Map[Int, Long] =
    Ivf.build(corpus, k, id = "vec_id", vec = "embedding")
      .assigned.groupBy("cell").count()
      .as[(Int, Long)].collect().toMap

  test("clusterBalanced admits exactly min(quota, cellSize) per cell") {
    val sizes = cellSizes(3)
    val got = DiversitySample
      .clusterBalanced(corpus, "vec_id", "embedding", nClusters = 3, perCluster = 15)
      .as[(Long, Int)].collect()
    val perCell = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(perCell === sizes.map { case (c, n) => c -> math.min(15L, n) })
    // sampled ids are a subset of the corpus
    assert(got.map(_._1).toSet.subsetOf(
      corpus.select("vec_id").as[Long].collect().toSet))
  }

  test("temperatureQuotas matches Mix.temperatureBudgets over the cluster masses") {
    val sizes = cellSizes(3)
    val budgets = Mix.temperatureBudgets(
        sizes.toSeq.toDF("cell", "n").withColumn("__one", lit(1L))
          .select(col("cell"), col("n").as("w")),
        "cell", "w", alpha = 1.0, totalBudget = 50L)
      .select("cell", "budget").as[(Int, Long)].collect().toMap
    val got = DiversitySample
      .temperatureQuotas(corpus, "vec_id", "embedding", nClusters = 3,
        alpha = 1.0, budget = 50)
      .as[(Long, Int)].collect()
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(got === budgets.map { case (c, b) => c -> math.min(b, sizes(c)) })
  }

  test("k > #modes keeps the tail mode at or above its corpus share (the D4 claim)") {
    val got = DiversitySample
      .clusterBalanced(corpus, "vec_id", "embedding", nClusters = 6, perCluster = 7)
      .as[(Long, Int)].collect()
    val tail = got.count(_._1 >= 2000L).toDouble / got.length
    assert(tail >= 0.12, f"tail share $tail%.3f not lifted above its 0.10 corpus share")
  }

  test("the From variants equal the end-to-end paths on the same assignment") {
    val a = Ivf.build(corpus, 3, id = "vec_id", vec = "embedding")
      .assigned.select(col("id").as("vec_id"), col("cell"))
    val flat = DiversitySample
      .clusterBalancedFrom(a, "vec_id", perCluster = 15)
      .as[(Long, Int)].collect().toSet
    val flatE2e = DiversitySample
      .clusterBalanced(corpus, "vec_id", "embedding", nClusters = 3, perCluster = 15)
      .as[(Long, Int)].collect().toSet
    assert(flat === flatE2e)
    val temp = DiversitySample
      .temperatureQuotasFrom(a, "vec_id", alpha = 0.5, budget = 40)
      .as[(Long, Int)].collect().toSet
    val tempE2e = DiversitySample
      .temperatureQuotas(corpus, "vec_id", "embedding", nClusters = 3,
        alpha = 0.5, budget = 40)
      .as[(Long, Int)].collect().toSet
    assert(temp === tempE2e)
  }

  test("deterministic: identical sample across runs") {
    def run() = DiversitySample
      .clusterBalanced(corpus, "vec_id", "embedding", nClusters = 3, perCluster = 7)
      .as[(Long, Int)].collect().toSet
    assert(run() === run())
  }
}
