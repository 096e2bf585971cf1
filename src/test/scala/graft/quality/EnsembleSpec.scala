package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnsembleSpec extends SparkSpec {
  import spark.implicits._

  // two signals with opposite orderings: s1 increases with id, s2
  // decreases — equal weights must cancel them to a flat blend
  private def frame = (0 until 100)
    .map(i => (i.toLong, i.toDouble, (99 - i).toDouble))
    .toDF("id", "s1", "s2")

  test("percentileBlend: opposite equal-weight signals cancel; single signal is its own rank") {
    val flat = Ensemble.percentileBlend(frame,
        Seq("s1" -> 1.0, "s2" -> 1.0), tieCol = "id")
      .select("blended").as[Double].collect().toSet
    assert(flat === Set(0.5), s"opposite ranks must average to 0.5: $flat")
    val solo = Ensemble.percentileBlend(frame, Seq("s1" -> 2.0), tieCol = "id")
      .select("id", "blended").as[(Long, Double)].collect().toMap
    assert(solo(0L) === 0.0 && solo(99L) === 1.0)
    assert(solo(50L) === math.rint(50.0 / 99 * 1e6) / 1e6)
  }

  test("tie-heavy signal: approxBlend lands mid-atom, matching tieAverage exact") {
    // 60% of rows share one value — the real-signal shape (integer token
    // counts, saturated heuristics). Tie-broken percent_rank SPREADS the
    // atom across [0.4, 1.0]; midrank pins it at its center.
    val fat = ((0 until 40).map(i => (i.toLong, i.toDouble)) ++
      (40 until 100).map(i => (i.toLong, 100.0))).toDF("id", "s1")
    val mid = Ensemble.percentileBlend(fat, Seq("s1" -> 1.0), tieCol = "id",
        tieAverage = true)
      .select("id", "blended").as[(Long, Double)].collect().toMap
    // atom rows all score the mean of ranks 40..99 over 99 = 69.5/99
    val atomMid = math.rint((40 to 99).map(_ / 99.0).sum / 60.0 * 1e6) / 1e6
    assert(mid(50L) === atomMid && mid(99L) === atomMid)
    val approx = Ensemble.approxBlend(fat, Seq("s1" -> 1.0), nProbes = 100)
      .select("id", "blended").as[(Long, Double)].collect().toMap
    val errs = mid.keys.map(k => math.abs(mid(k) - approx(k)))
    assert(errs.max <= 0.05,
      s"approx must track the MIDRANK exact on a fat atom: max err ${errs.max}")
    // and it must NOT track the tie-broken spread (doc 99 sits at 1.0 there)
    assert(math.abs(approx(99L) - 1.0) > 0.2,
      "approx scores the atom as a block, not at its tie-broken top")
  }

  test("percentileBlend fails loudly on a corpus-shaped (many-partition) input") {
    val wide = frame.repartition(CcnetBuckets.ExactPathMaxParts + 1)
    val e = intercept[IllegalArgumentException] {
      Ensemble.percentileBlend(wide, Seq("s1" -> 1.0), tieCol = "id")
    }
    assert(e.getMessage.contains("approxBlend"),
      s"guard must point at the scale path: ${e.getMessage}")
    // and the same input sails through the scale path
    assert(Ensemble.approxBlend(wide, Seq("s1" -> 1.0)).count() === 100)
  }

  test("approxBlend tracks the exact blend within grid + sketch error") {
    val exact = Ensemble.percentileBlend(frame,
        Seq("s1" -> 0.7, "s2" -> 0.3), tieCol = "id")
      .select("id", "blended").as[(Long, Double)].collect().toMap
    val approx = Ensemble.approxBlend(frame,
        Seq("s1" -> 0.7, "s2" -> 0.3), nProbes = 100)
      .select("id", "blended").as[(Long, Double)].collect().toMap
    assert(approx.keySet === exact.keySet)
    val maxErr = exact.keys.map(k => math.abs(exact(k) - approx(k))).max
    assert(maxErr <= 0.05, s"max |exact - approx| = $maxErr")
    // ordering is preserved up to near-ties: top decile by approx overlaps
    // the exact top decile almost entirely
    val topE = exact.toSeq.sortBy(-_._2).take(10).map(_._1).toSet
    val topA = approx.toSeq.sortBy(-_._2).take(10).map(_._1).toSet
    assert((topE & topA).size >= 8, s"top-decile overlap ${(topE & topA).size}")
  }

  test("NaN signals rank at the top on BOTH paths, not opposite extremes") {
    // a 0/0 signal (repetition fraction of an empty doc) is NaN; Spark
    // sorts NaN above every double, so percent_rank puts it at ~1.0 — the
    // approx fold must agree, not score it 0
    val withNan = ((0 until 20).map(i => (i.toLong, i.toDouble)) :+
      (99L, Double.NaN)).toDF("id", "s1")
    val exact = Ensemble.percentileBlend(withNan, Seq("s1" -> 1.0), tieCol = "id")
      .select("id", "blended").as[(Long, Double)].collect().toMap
    val approx = Ensemble.approxBlend(withNan, Seq("s1" -> 1.0), nProbes = 50)
      .select("id", "blended").as[(Long, Double)].collect().toMap
    assert(exact(99L) === 1.0, s"exact path must rank NaN top: ${exact(99L)}")
    assert(approx(99L) >= 0.95,
      s"approx path must rank NaN at the top like the exact: ${approx(99L)}")
  }
}
