package graft.quality

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("summary: hand-computed smoothed KL and JS on a tiny pair") {
    val a = Seq((1L, "x x y")).toDF("id", "text")
    val b = Seq((1L, "x z")).toDF("id", "text")
    // union vocab {x,y,z}: pa = (c+0.5)/(3+1.5), pb = (c+0.5)/(2+1.5)
    val pa = Map("x" -> 2.5 / 4.5, "y" -> 1.5 / 4.5, "z" -> 0.5 / 4.5)
    val pb = Map("x" -> 1.5 / 3.5, "y" -> 0.5 / 3.5, "z" -> 1.5 / 3.5)
    def fold(contrib: String => Double) = r6(
      Seq("x", "y", "z").map(t => math.rint(r6(contrib(t)) * 1e6).toLong)
        .sum.toDouble / 1e6)
    val expKlAb = fold(t => pa(t) * math.log(pa(t) / pb(t)))
    val expKlBa = fold(t => pb(t) * math.log(pb(t) / pa(t)))
    val expJs = fold { t =>
      val m = (pa(t) + pb(t)) / 2.0
      (pa(t) * math.log(pa(t) / m) + pb(t) * math.log(pb(t) / m)) / 2.0
    }
    val got = Drift.summary(a, b, "text")
      .as[(Double, Double, Double, Long, Long, Long, Long, Long)].head()
    assert(got === ((expKlAb, expKlBa, expJs, 3L, 1L, 1L, 3L, 2L)))
    assert(expKlAb > 0 && expKlBa > 0 && expJs > 0 && expJs < math.log(2))
  }

  test("identical corpora have zero drift; JS is symmetric") {
    val a = Seq((1L, "p q q r")).toDF("id", "text")
    val s0 = Drift.summary(a, a, "text")
      .select("kl_ab", "kl_ba", "js").as[(Double, Double, Double)].head()
    assert(s0 === ((0.0, 0.0, 0.0)))
    val b = Seq((1L, "p p s")).toDF("id", "text")
    val ab = Drift.summary(a, b, "text").select("js").as[Double].head()
    val ba = Drift.summary(b, a, "text").select("js").as[Double].head()
    assert(ab === ba)
  }

  test("topShifts surfaces the moved term first, deterministic ties") {
    val a = Seq((1L, "common common common moved")).toDF("id", "text")
    val b = Seq((1L, "common common common stay")).toDF("id", "text")
    val top = Drift.topShifts(a, b, "text", k = 2)
      .select("term").as[String].collect().toSeq
    // 'moved' and 'stay' tie on |js contribution| (symmetric counts);
    // the term tie-break makes the order stable
    assert(top === Seq("moved", "stay"))
  }
}
