package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized properties for the temporal joins: the distributed plans must
  * equal a brute-force per-key reference on arbitrary small datasets —
  * including ties, duplicate timestamps on the left, keys missing from one
  * side, and negative timestamps (floor-bucket semantics).
  */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val keyGen = Gen.choose(0, 3).map(k => s"k$k")
  // negative and positive timestamps, small range to force collisions/ties
  private val tsGen = Gen.choose(-50L, 50L)

  test("asof latestPrior equals the brute-force per-key reference") {
    (1L to 8L).foreach { seed =>
      val leftRows = sample(Gen.listOfN(25, Gen.zip(keyGen, tsGen)), seed)
        .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      val rightRaw = sample(Gen.listOfN(25, Gen.zip(keyGen, tsGen, Gen.choose(0, 999))), seed + 100)
      // right must be unique per (key, ts): keep max payload
      val rightRows = rightRaw.groupBy(r => (r._1, r._2))
        .map { case ((k, ts), rs) => (k, ts, rs.map(_._3).max) }.toSeq

      val left = leftRows.toDF("k", "lts", "row_id")
      val right = rightRows.toDF("k", "rts", "payload")
      val got = AsOfJoin.latestPrior(left, right, Seq("k"), "lts", "rts")
        .select("row_id", "asof_rts", "asof_payload")
        .as[(Long, Option[Long], Option[Int])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

      leftRows.foreach { case (k, lts, rowId) =>
        val cands = rightRows.filter(r => r._1 == k && r._2 <= lts)
        val expected =
          if (cands.isEmpty) (None, None)
          else {
            val best = cands.maxBy(_._2)
            (Some(best._2), Some(best._3))
          }
        assert(got(rowId) === expected, s"seed=$seed row=$rowId key=$k lts=$lts")
      }
    }
  }

  test("band join equals the brute-force pair filter, including negative ts") {
    (1L to 8L).foreach { seed =>
      val aRows = sample(Gen.listOfN(20, Gen.zip(keyGen, tsGen)), seed)
        .zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val bRows = sample(Gen.listOfN(20, Gen.zip(keyGen, tsGen)), seed + 100)
        .zipWithIndex.map { case ((k, ts), i) => (i.toLong + 1000L, k, ts) }
      val width = 1L + (seed % 7)

      val a = aRows.toDF("a_id", "k", "a_ts")
      val b = bRows.toDF("b_id", "k", "b_ts")
      val got = BandJoin.within(a, b, Seq("k"), "a_ts", "b_ts", width)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet

      val expected = (for {
        (aid, ak, ats) <- aRows
        (bid, bk, bts) <- bRows
        if ak == bk && math.abs(ats - bts) <= width
      } yield (aid, bid)).toSet
      assert(got === expected, s"seed=$seed width=$width")

      // each qualifying pair appears exactly once (no explode duplicates)
      val n = BandJoin.within(a, b, Seq("k"), "a_ts", "b_ts", width).count()
      assert(n === expected.size, s"seed=$seed duplicate pairs")
    }
  }

  test("gapFill grid equals the brute-force dense series, including negative ts") {
    (1L to 5L).foreach { seed =>
      val rows = sample(Gen.listOfN(30, Gen.zip(keyGen, tsGen)), seed)
      val step = 7L
      val df = rows.toDF("k", "ts")
      val got = Resample.gapFill(df, Seq("k"), "ts", step,
          aggs = Seq("n" -> org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1))),
          fills = Seq("n" -> org.apache.spark.sql.functions.lit(0L)))
        .select("k", "bucket_start", "n")
        .as[(String, Long, Long)].collect().toSet

      val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
        def bucket(ts: Long) = ts - java.lang.Math.floorMod(ts, step)
        val buckets = rs.map(r => bucket(r._2))
        val counts = buckets.groupBy(identity).view.mapValues(_.size.toLong).toMap
        (buckets.min to buckets.max by step).map(b => (k, b, counts.getOrElse(b, 0L)))
      }.toSet
      assert(got === expected, s"seed=$seed")
    }
  }
}
