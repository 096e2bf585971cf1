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

  test("rerank corpus with a different id column works via rId") {
    val cb = Pq.train(corpus, m = 8, kc = 16, trainSample = 200)
    val codes = Pq.encode(corpus, cb)
    val probes = corpus.where(col("vec_id") % 25 === 0)
    val renamed = corpus.withColumnRenamed("vec_id", "item_id")
      .withColumnRenamed("embedding", "emb2")
    val viaRId = Pq.search(cb, codes, probes, k = 5, shortlist = 30,
        rerank = Some(renamed), rVec = "emb2", rId = Some("item_id"))
      .select("q_id", "n_id", "rank")
    val baseline = Pq.search(cb, codes, probes, k = 5, shortlist = 30,
        rerank = Some(corpus)).select("q_id", "n_id", "rank")
    assert(viaRId.exceptAll(baseline).isEmpty && baseline.exceptAll(viaRId).isEmpty)
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

  test("native encode equals the interpreted HOF formulation") {
    import graft.functions.VectorFunctions._
    val cb = Pq.train(corpus, m = 8, kc = 16, trainSample = 200)
    // the HOF formulation the native expression replaced — kept here as
    // the executable specification
    val cbLit = typedlit(cb.centers)
    def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
    val hof = transform(sequence(lit(0), lit(cb.m - 1)), mi => {
      val subvec = slice(normalizeFast(col("embedding")), mi * cb.sub + 1, lit(cb.sub))
      val dists = transform(element_at(cbLit, mi + 1),
        c => l2sq(subvec, transform(c, _.cast("float"))))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
    graft.GraftFunctions.register(spark)
    val both = corpus.select(col("vec_id"),
      Pq.encodeExpr(normalizeFast(col("embedding")), cb).as("native"),
      hof.as("hof"))
    assert(both.where(not(col("native") <=> col("hof"))).count() == 0L,
      "identical codes on every finite vector")
    // DELIBERATE divergence on non-finite input: a zero vector normalizes
    // to NaN; the HOF quirkily encodes it to code 0 (Spark treats NaN=NaN
    // as true inside array_position), while the native expression returns
    // null so garbage rows drop out of ADC scoring instead of competing
    // with real candidates
    val zero = Seq((9999L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    assert(zero.select(Pq.encodeExpr(normalizeFast(col("embedding")), cb).isNull)
      .head().getBoolean(0), "NaN vector encodes to null")
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
