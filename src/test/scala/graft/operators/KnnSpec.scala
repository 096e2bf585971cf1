package graft.operators

import graft.SparkSpec

class KnnSpec extends SparkSpec {
  import spark.implicits._

  // Three tight clusters around orthogonal axes + noise dims.
  private def vecs = {
    def v(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(8)(0.0f)
      a(axis) = 1.0f
      a((axis + 1) % 8) = eps
      a
    }
    Seq(
      (0L, v(0, 0.01f)), (1L, v(0, 0.02f)), (2L, v(0, 0.03f)),
      (10L, v(3, 0.01f)), (11L, v(3, 0.02f)), (12L, v(3, 0.03f)),
      (20L, v(6, 0.01f)), (21L, v(6, 0.02f))
    ).toDF("vec_id", "embedding")
  }

  test("brute-force knn returns cluster-mates first") {
    val nn = Knn.bruteForce(vecs.where("vec_id = 0"), vecs, k = 2)
      .select("n_id").as[Long].collect().toSet
    assert(nn === Set(1L, 2L))
  }

  test("self excluded by default, included on request") {
    val withSelf = Knn.bruteForce(vecs.where("vec_id = 0"), vecs, k = 1, excludeSelf = false)
      .select("n_id").as[Long].collect()
    assert(withSelf.head === 0L) // self similarity 1.0 ranks first
  }

  test("lsh ann recalls cluster-mates (same bucket) without cross product") {
    val nn = Knn.lsh(vecs.where("vec_id = 10"), vecs, k = 2, nBits = 8, bandBits = 2)
      .select("n_id").as[Long].collect().toSet
    assert(nn.subsetOf(Set(11L, 12L)) && nn.nonEmpty)
  }

  test("cosineNearDup finds within-cluster pairs only at high threshold") {
    val pairs = Knn.cosineNearDup(vecs, threshold = 0.99, nBits = 8, bandBits = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    // no cross-cluster pair can be >= 0.99 (clusters are orthogonal)
    assert(pairs.forall { case (a, b) => (a / 10) == (b / 10) })
  }

  test("brute-force ranking matches a window row_number reference") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    // larger random-ish corpus with duplicate vectors → sim ties exercise
    // the (sim desc, n_id asc) tie-break
    val corpus = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d => (((i % 7) + d) % 5).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = corpus.where("vec_id < 3")
    val got = Knn.bruteForce(probes, corpus, k = 4)
      .select("q_id", "n_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val q = broadcast(probes.select(col("vec_id").as("q_id"),
      normalizeFast(col("embedding")).as("q_vec")))
    val scored = corpus.select(col("vec_id").as("n_id"),
        normalizeFast(col("embedding")).as("n_vec"))
      .crossJoin(q).where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dotFast(col("q_vec"), col("n_vec")), 6).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    val ref = scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 4)
      .select("q_id", "n_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === ref)
  }

  test("brute-force shuffles queries x partitions heap rows, not the scored corpus") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val nPart = 6
    val corpus = (0L until 300L).map { i =>
      (i, Array.tabulate(8)(d => (((i % 7) + d) % 5).toFloat))
    }.toDF("vec_id", "embedding").repartition(nPart).cache()
    corpus.count() // materialize so the repartition shuffle is not re-run
    val probes = corpus.where("vec_id < 3")
    val df = Knn.bruteForce(probes, corpus, k = 4)
    df.collect()

    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = {
      val self = p match { case s: ShuffleExchangeLike => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(shuffles)
    }
    // the exchange fed by the partial graft_kmin aggregate
    val aggShuffles = shuffles(df.queryExecution.executedPlan)
      .filter(_.child.toString.contains("graft_kmin"))
    assert(aggShuffles.nonEmpty, "expected a partial-aggregate exchange")
    val written = aggShuffles
      .map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
    // 3 queries x 6 partitions = 18 heap rows max; the unbounded plan would
    // shuffle ~3x300 = 900 scored rows
    assert(written > 0 && written <= 3L * nPart,
      s"partial top-k should bound the shuffle, wrote $written records")
    corpus.unpersist()
  }

  test("cosine math matches manual computation") {
    import graft.functions.VectorFunctions._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val sim = df.select(cosineFast(org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).as[Double].collect().head
    assert(math.abs(sim - 1.0 / math.sqrt(2)) < 1e-12)
  }
}
