package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CcnetBucketsSpec extends SparkSpec {
  import spark.implicits._

  // two languages with clearly graded scores: ids 0..29 score -i (lang a),
  // ids 100..129 score -2i (lang b) — terciles are unambiguous
  private def scored = ((0 until 30).map(i => (i.toLong, "a", -i.toDouble)) ++
    (0 until 30).map(i => (100L + i, "b", -2.0 * i)))
    .toDF("doc_id", "lang", "score")

  test("exact: per-language terciles, bucket 1 = best scores, deterministic") {
    val out = CcnetBuckets.exact(scored, "lang", "score", "doc_id")
      .select("doc_id", "lang", "bucket")
      .as[(Long, String, Int)].collect()
    val byDoc = out.map(r => r._1 -> r._3).toMap
    for (i <- 0 until 10) assert(byDoc(i.toLong) === 1, s"doc $i head")
    for (i <- 10 until 20) assert(byDoc(i.toLong) === 2, s"doc $i middle")
    for (i <- 20 until 30) assert(byDoc(i.toLong) === 3, s"doc $i tail")
    // language b is bucketed independently of a's score range
    for (i <- 0 until 10) assert(byDoc(100L + i) === 1, s"b doc $i head")
    assert(out.length === 60)
  }

  test("exact fails loudly on a corpus-shaped (many-partition) input; approx does not") {
    val wide = scored.repartition(CcnetBuckets.ExactPathMaxParts + 1)
    val e = intercept[IllegalArgumentException] {
      CcnetBuckets.exact(wide, "lang", "score", "doc_id")
    }
    assert(e.getMessage.contains("CcnetBuckets.approx"),
      s"guard must point at the scale path: ${e.getMessage}")
    assert(CcnetBuckets.approx(wide, "lang", "score").count() === 60)
    // the override exists for deliberate measurements
    assert(CcnetBuckets.exact(wide, "lang", "score", "doc_id",
      maxParts = Int.MaxValue).count() === 60)
  }

  test("approx agrees with exact away from the tercile boundaries") {
    val exact = CcnetBuckets.exact(scored, "lang", "score", "doc_id")
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    val approx = CcnetBuckets.approx(scored, "lang", "score")
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    assert(approx.keySet === exact.keySet)
    // KLL rank error can flip docs AT a boundary; everything else agrees
    val disagree = exact.count { case (id, b) => approx(id) != b }
    assert(disagree <= 6, s"$disagree of ${exact.size} docs moved buckets")
    // ordering semantics hold exactly: a doc in a better approx bucket
    // never scores below a doc in a worse one, per language
    val rows = CcnetBuckets.approx(scored, "lang", "score")
      .select("lang", "score", "bucket").as[(String, Double, Int)].collect()
    for (l <- Seq("a", "b")) {
      val perLang = rows.filter(_._1 == l)
      val worstPerBucket = perLang.groupBy(_._3).view.mapValues(_.map(_._2).min)
      for (b <- 1 until 3 if worstPerBucket.contains(b) && worstPerBucket.contains(b + 1))
        assert(worstPerBucket(b) >= perLang.filter(_._3 == b + 1).map(_._2).max,
          s"lang $l: bucket $b overlaps bucket ${b + 1}")
    }
  }
}
