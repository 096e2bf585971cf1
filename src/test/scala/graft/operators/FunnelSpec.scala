package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_type")

  test("earliest strictly-ordered chain within the window") {
    val events = ev(
      // u1 completes: view@10 -> click@20 -> buy@30 (ignores click@5 before view)
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      // u2 drops after click; buy equals click ts -> NOT strictly after
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 20L, "buy"),
      // u3 buys outside the window of t1
      (3L, 0L, "view"), (3L, 10L, "click"), (3L, 200L, "buy"),
      // u4 never views
      (4L, 10L, "click"), (4L, 20L, "buy"))
    val times = Funnel.stepTimes(events, "user_id", "ts", "event_type", steps, window = 100L)
      .orderBy("user_id")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(times === Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), Some(20L), None),
      (3L, Some(0L), Some(10L), None)))
  }

  test("greedy earliest times find a completion a later chain would miss") {
    // view@0; clicks@10,90; buy@95, window 100: greedy t2=10 allows buy@95.
    // (A non-greedy chain via click@90 would also allow it; but window end
    // is t1+100=100, so buy@95 qualifies either way. The real greedy test:
    // buy@15 comes BEFORE click@90 — only t2=10 can catch it.)
    val events = ev(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 90L, "click"), (1L, 15L, "buy"))
    val times = Funnel.stepTimes(events, "user_id", "ts", "event_type", steps, window = 100L)
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().head
    assert(times === ((1L, Some(0L), Some(10L), Some(15L))))
  }

  test("conversion counts per step") {
    val events = ev(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "buy"),
      (2L, 0L, "view"), (2L, 1L, "click"),
      (3L, 0L, "view"),
      (4L, 0L, "click")) // never in funnel
    val out = Funnel.conversion(events, "user_id", "ts", "event_type", steps, 100L)
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((1, "view", 3L), (2, "click", 2L), (3, "buy", 1L)))
  }

  test("step times equal a sequential greedy reference on random event streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](gen: Gen[A], seed: Long): A =
      gen.apply(Gen.Parameters.default, Seed(seed)).get
    // tight ts range + few users force ties, same-ts chains, window edges
    val evGen = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 30L),
      Gen.oneOf("view", "click", "buy", "other"))
    (1L to 8L).foreach { seed =>
      val events = sample(Gen.listOfN(60, evGen), seed)
      // greedy reference: t1 = first step-1 event; t_k = first step-k event
      // strictly after t_{k-1} and within window of t1
      val window = 15L
      def ref(user: Long): Option[Seq[Option[Long]]] = {
        val mine = events.filter(_._1 == user)
        val t1 = mine.filter(_._3 == steps.head).map(_._2).minOption
        t1.map { start =>
          var prev = Option(start)
          Option(start) +: steps.tail.map { st =>
            val next = prev.flatMap(p => mine
              .filter(e => e._3 == st && e._2 > p && e._2 <= start + window)
              .map(_._2).minOption)
            prev = next
            next
          }
        }
      }
      val got = Funnel.stepTimes(events.toDF("user_id", "ts", "event_type"),
          "user_id", "ts", "event_type", steps, window)
        .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
        .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
      (1L to 5L).foreach { u =>
        assert(got.get(u) === ref(u), s"seed=$seed user=$u")
      }
    }
  }
}
