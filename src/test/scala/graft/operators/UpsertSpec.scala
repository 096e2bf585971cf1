package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def existing = Seq(
    ("k1", "old1", "2023-05-01"), ("k2", "old2", "2023-05-01"),
    ("k3", "old3", "2023-05-01")).toDF("GlobalKey", "v", "export_end_date")

  test("updates win, untouched keys kept, tombstones subtract") {
    val updates = Seq(("k2", "new2", "2023-05-08"), ("k4", "new4", "2023-05-08"))
      .toDF("GlobalKey", "v", "export_end_date")
    val deletes = Seq(Tuple1("k3")).toDF("GlobalKey")
    val out = Upsert(existing, updates, Seq("GlobalKey"), Some(deletes))
      .select("GlobalKey", "v").as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "old1", "k2" -> "new2", "k4" -> "new4"))
  }

  test("latestWins dedups the incoming batch before merging") {
    val updates = Seq(
      ("k1", "mid", "2023-05-05"), ("k1", "newest", "2023-05-09"))
      .toDF("GlobalKey", "v", "export_end_date")
    val out = Upsert.latestWins(existing, updates, Seq("GlobalKey"), "export_end_date")
      .select("GlobalKey", "v").as[(String, String)].collect().toMap
    assert(out("k1") === "newest" && out("k2") === "old2")
  }

  test("idempotent: re-applying the same batch changes nothing") {
    val updates = Seq(("k2", "new2", "2023-05-08")).toDF("GlobalKey", "v", "export_end_date")
    val once = Upsert(existing, updates, Seq("GlobalKey"))
    val twice = Upsert(once, updates, Seq("GlobalKey"))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("applyChanges: stale upserts cannot replace a newer snapshot row") {
    // advisor finding (r14): replacement must be ordering-aware like the
    // tombstone path — a replayed/out-of-order change batch with an OLDER
    // orderingCol must lose to the existing snapshot row
    val snap = Seq(("k1", 10L, "new"), ("k2", 10L, "keep"))
      .toDF("k", "ord", "v")
    val stale = Seq(("k1", 5L, false, "old"), ("k3", 5L, false, "ins"))
      .toDF("k", "ord", "del", "v")
    val out = Upsert.applyChanges(snap, stale, Seq("k"), "ord", "del")
      .as[(String, Long, String)].collect().toSet
    assert(out === Set(("k1", 10L, "new"), ("k2", 10L, "keep"), ("k3", 5L, "ins")))
    // equal ordering: the change row wins (whole-batch replay idempotence)
    val replay = Seq(("k1", 10L, false, "new")).toDF("k", "ord", "del", "v")
    val re = Upsert.applyChanges(snap, replay, Seq("k"), "ord", "del")
      .as[(String, Long, String)].collect().toSet
    assert(re === Set(("k1", 10L, "new"), ("k2", 10L, "keep")))
  }

  test("applyChanges: snapshot is invariant to micro-batch boundaries on random CDC logs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](gen: Gen[A], seed: Long): A =
      gen.apply(Gen.Parameters.default, Seed(seed)).get
    // (key, delete?, payload); ord assigned by log position (unique, so the
    // latest-wins winner is unambiguous and boundary placement is the only
    // variable under test — the sweep-1 bug was exactly a boundary-dependent
    // snapshot)
    val chGen = Gen.zip(Gen.choose(0, 4).map(k => s"k$k"),
      Gen.frequency(3 -> Gen.const(false), 1 -> Gen.const(true)),
      Gen.choose(0, 99))
    (1L to 6L).foreach { seed =>
      val log = sample(Gen.listOfN(30, chGen), seed).zipWithIndex
        .map { case ((k, del, v), i) => (k, i.toLong, del, v) }
      // reference: last change per key wins; a winning tombstone removes the key
      val expected = log.groupBy(_._1).flatMap { case (k, rows) =>
        val w = rows.maxBy(_._2)
        if (w._3) None else Some((k, w._2, w._4))
      }.toSet
      def df(rows: Seq[(String, Long, Boolean, Int)]) =
        rows.toDF("k", "ord", "del", "v")
      val empty = Seq.empty[(String, Long, Boolean, Int)]
        .toDF("k", "ord", "del", "v").drop("del")
      val oneShot = Upsert.applyChanges(empty, df(log), Seq("k"), "ord", "del")
        .as[(String, Long, Int)].collect().toSet
      assert(oneShot === expected, s"seed=$seed one-shot")
      // split the ord-ordered log at 2 random contiguous boundaries and
      // apply the three micro-batches sequentially
      val b1 = sample(Gen.choose(0, log.size), seed + 11)
      val b2 = sample(Gen.choose(b1, log.size), seed + 12)
      val batches = Seq(log.take(b1), log.slice(b1, b2), log.drop(b2))
      val finalSnap = batches.filter(_.nonEmpty).foldLeft(empty) { (snap, b) =>
        Upsert.applyChanges(snap, df(b), Seq("k"), "ord", "del")
      }.as[(String, Long, Int)].collect().toSet
      assert(finalSnap === expected, s"seed=$seed split at ($b1, $b2)")
    }
  }
}
