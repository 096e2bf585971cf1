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

  test("cosine math matches manual computation") {
    import graft.functions.VectorFunctions._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val sim = df.select(cosineFast(org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).as[Double].collect().head
    assert(math.abs(sim - 1.0 / math.sqrt(2)) < 1e-12)
  }
}
