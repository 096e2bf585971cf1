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
}
