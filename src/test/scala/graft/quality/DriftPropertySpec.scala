package graft.quality

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized driver-local reference for [[Drift]] (the
  * randomized-reference convention): random word-soup corpora on both
  * sides, the whole smoothed-KL/JS pipeline recomputed in plain Scala.
  */
class DriftPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
  private def corpusGen: Gen[Seq[String]] = for {
    n <- Gen.choose(1, 6)
    docs <- Gen.listOfN(n,
      Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("summary matches the local recompute across random corpora") {
    (1L to 10L).foreach { seed =>
      val da = sample(corpusGen, seed * 13 + 1)
      val db = sample(corpusGen, seed * 13 + 7)
      def cnt(docs: Seq[String]) =
        docs.flatMap(_.split(" ")).groupBy(identity).view
          .mapValues(_.size.toLong).toMap
      val (ca, cb) = (cnt(da), cnt(db))
      val union = (ca.keySet ++ cb.keySet).toSeq.sorted
      val (ta, tb) = (ca.values.sum, cb.values.sum)
      val v = union.size
      def fold(contrib: String => Double) = r6(
        union.map(t => math.rint(r6(contrib(t)) * 1e6).toLong)
          .sum.toDouble / 1e6)
      def pa(t: String) = (ca.getOrElse(t, 0L) + 0.5) / (ta + 0.5 * v)
      def pb(t: String) = (cb.getOrElse(t, 0L) + 0.5) / (tb + 0.5 * v)
      val exp = (
        fold(t => pa(t) * math.log(pa(t) / pb(t))),
        fold(t => pb(t) * math.log(pb(t) / pa(t))),
        fold { t =>
          val m = (pa(t) + pb(t)) / 2.0
          (pa(t) * math.log(pa(t) / m) + pb(t) * math.log(pb(t) / m)) / 2.0
        },
        v.toLong,
        union.count(t => !cb.contains(t)).toLong,
        union.count(t => !ca.contains(t)).toLong,
        ta, tb)
      val got = Drift.summary(
          da.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
          db.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
          "text")
        .as[(Double, Double, Double, Long, Long, Long, Long, Long)].head()
      assert(got === exp, s"seed=$seed a=$da b=$db")
    }
  }
}
