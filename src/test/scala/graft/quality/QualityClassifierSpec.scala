package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // shared filler vocabulary + class-specific marker tokens: linearly
  // separable by construction, through shared hash buckets
  private def doc(i: Int, positive: Boolean): (Long, String, Int) = {
    val filler = Seq("the", "quick", "data", "table", "row", "scan",
      "query", "batch").drop(i % 3).take(5).mkString(" ")
    val markers = if (positive) "crisp coherent prose" else "zzjunk zzspam zzgarble"
    ((if (positive) 1000 + i else 2000 + i).toLong, s"$filler $markers $filler", if (positive) 1 else 0)
  }

  private val train = ((0 until 20).map(doc(_, true)) ++
    (0 until 20).map(doc(_, false))).toDF("doc_id", "text", "label")
  private val holdout = ((20 until 30).map(doc(_, true)) ++
    (20 until 30).map(doc(_, false))).toDF("doc_id", "text", "label")

  test("learns a separable task; holdout scores split cleanly at 0.5") {
    val m = QualityClassifier.train(train, "doc_id", "text", "label",
      nBuckets = 256, iters = 150, lr = 1.0)
    val scored = QualityClassifier.score(holdout, "doc_id", "text", m)
      .join(holdout.select("doc_id", "label"), "doc_id")
      .select("doc_id", "score", "label")
      .as[(Long, Double, Int)].collect()
    assert(scored.length === 20)
    val acc = scored.count { case (_, s, y) => (s >= 0.5) == (y == 1) } / 20.0
    assert(acc === 1.0, s"expected clean separation, scores=${scored.toSeq}")
    // margins, not just the right side of the line
    assert(scored.filter(_._3 == 1).map(_._2).min > 0.6)
    assert(scored.filter(_._3 == 0).map(_._2).max < 0.4)
  }

  test("training is deterministic at the prediction level") {
    val m1 = QualityClassifier.train(train, "doc_id", "text", "label",
      nBuckets = 256, iters = 15, lr = 0.5)
    val m2 = QualityClassifier.train(train, "doc_id", "text", "label",
      nBuckets = 256, iters = 15, lr = 0.5)
    val s1 = QualityClassifier.score(holdout, "doc_id", "text", m1)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val s2 = QualityClassifier.score(holdout, "doc_id", "text", m2)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(s1.map(_._1) === s2.map(_._1))
    s1.zip(s2).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b") }
  }

  test("local iteration route matches the distributed loop at the prediction level") {
    // hybrid routing (Bpe localVocabLimit shape): both routes share the
    // per-doc accumulation and Adagrad step verbatim, so they may differ
    // only in float summation order — ulp-level, invisible at 1e-6
    val local = QualityClassifier.train(train, "doc_id", "text", "label",
      nBuckets = 256, iters = 15, lr = 0.5) // default limit: local route
    val dist = QualityClassifier.train(train, "doc_id", "text", "label",
      nBuckets = 256, iters = 15, lr = 0.5, localFeatureLimit = 0L)
    val sl = QualityClassifier.score(holdout, "doc_id", "text", local)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val sd = QualityClassifier.score(holdout, "doc_id", "text", dist)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(sl.map(_._1) === sd.map(_._1))
    sl.zip(sd).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b") }
  }

  test("docs with no grams produce no score row; empty training set rejected") {
    val m = QualityClassifier.train(train, "doc_id", "text", "label",
      nBuckets = 64, iters = 2)
    val withEmpty = Seq((1L, "real text here"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(withEmpty, "doc_id", "text", m)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L))
    intercept[IllegalArgumentException] {
      QualityClassifier.train(train.where(lit(false)), "doc_id", "text", "label",
        nBuckets = 64, iters = 1)
    }
  }
}
