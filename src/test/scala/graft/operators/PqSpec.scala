package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8 well-separated cluster prototypes in 64-dim, 25 noisy members each
  private def corpus = {
    val rnd = new scala.util.Random(7)
    val protos = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 8; i <- 0 until 25) yield {
      val v = protos(c).map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      ((c * 25 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("codes have length m with values inside [0, kc)") {
    val cb = Pq.train(corpus, m = 8, kc = 8, trainSample = 200)
    val codes = Pq.encode(corpus, cb).select("codes")
      .as[Seq[Int]].collect()
    assert(codes.forall(_.length == 8))
    assert(codes.flatten.forall(c => c >= 0 && c < 8))
  }

  test("training is deterministic") {
    val a = Pq.train(corpus, m = 4, kc = 4, trainSample = 100)
    val b = Pq.train(corpus, m = 4, kc = 4, trainSample = 100)
    assert(a == b)
  }

  test("ADC + exact rerank recovers brute-force neighbors on clustered data") {
    val cb = Pq.train(corpus, m = 8, kc = 16, trainSample = 200)
    val codes = Pq.encode(corpus, cb)
    val probes = corpus.where(col("vec_id") % 25 === 0)
    val approx = Pq.search(cb, codes, probes, k = 5, shortlist = 30,
      rerank = Some(corpus)).select("q_id", "n_id")
    val exact = Knn.bruteForce(probes, corpus, k = 5).select("q_id", "n_id")
    val hit = exact.join(approx, Seq("q_id", "n_id"), "left_semi").count()
    val total = exact.count()
    assert(total == 40)
    assert(hit.toDouble / total >= 0.8,
      s"recall@5 = ${hit.toDouble / total} below 0.8")
  }

  test("ADC-only search still finds the right cluster") {
    val cb = Pq.train(corpus, m = 8, kc = 16, trainSample = 200)
    val codes = Pq.encode(corpus, cb)
    val probes = corpus.where(col("vec_id") === 0)
    val got = Pq.search(cb, codes, probes, k = 10).select("n_id")
      .as[Long].collect()
    assert(got.nonEmpty && got.forall(_ < 25),
      s"ADC neighbors of a cluster-0 member must be cluster 0, got ${got.toSeq}")
  }

  test("ranking shuffles k-capped heaps over codes, not scored rows") {
    val cb = Pq.train(corpus, m = 4, kc = 4, trainSample = 100)
    val codes = Pq.encode(corpus, cb)
    val probes = corpus.where(col("vec_id") < 2)
    val plan = Pq.search(cb, codes, probes, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_kmin"), plan.take(1500))
  }
}
