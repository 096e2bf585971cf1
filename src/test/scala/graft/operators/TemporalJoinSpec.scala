package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AsOfJoin / BandJoin / Resample — the time-series alignment operators. */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, reading)
  private def right = Seq(
    ("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u1", 30L, 3.0),
    ("u2", 15L, 9.0)
  ).toDF("k", "rts", "reading")

  // (key, ts, id)
  private def left = Seq(
    ("u1", 5L, "a"),   // before any right row -> null match
    ("u1", 20L, "b"),  // exactly at a right ts -> that row matches (<=)
    ("u1", 29L, "c"),  // between 20 and 30 -> 20 matches
    ("u2", 100L, "d"), // far after -> 15 matches (no tolerance)
    ("u3", 50L, "e")   // key with no right rows at all
  ).toDF("k", "lts", "id")

  test("asof latestPrior: backward <= semantics, per key") {
    val out = AsOfJoin.latestPrior(left, right, Seq("k"), "lts", "rts")
      .select("id", "asof_rts", "asof_reading")
      .as[(String, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(out("a") === ((None, None)))
    assert(out("b") === ((Some(20L), Some(2.0))))
    assert(out("c") === ((Some(20L), Some(2.0))))
    assert(out("d") === ((Some(15L), Some(9.0))))
    assert(out("e") === ((None, None)))
  }

  test("asof tolerance nulls out stale matches") {
    val out = AsOfJoin.latestPrior(left, right, Seq("k"), "lts", "rts",
        tolerance = Some(10L))
      .select("id", "asof_rts").as[(String, Option[Long])].collect().toMap
    assert(out("d") === None)       // 100 - 15 > 10
    assert(out("c") === Some(20L))  // 29 - 20 <= 10
  }

  test("asof preserves left row count and column order") {
    val out = AsOfJoin.latestPrior(left, right, Seq("k"), "lts", "rts")
    assert(out.count() === left.count())
    assert(out.columns.take(3).toSeq === Seq("k", "lts", "id"))
  }

  test("band join finds exactly the pairs within width, once each") {
    val a = Seq(("u1", 0L, "a0"), ("u1", 100L, "a1"), ("u2", 50L, "a2"))
      .toDF("k", "a_ts", "a_id")
    val b = Seq(("u1", 60L, "b0"), ("u1", 199L, "b1"), ("u1", 201L, "b2"),
        ("u2", 50L, "b3"))
      .toDF("k", "b_ts", "b_id")
    val pairs = BandJoin.within(a, b, Seq("k"), "a_ts", "b_ts", width = 100L)
      .select("a_id", "b_id").as[(String, String)].collect().toSet
    // a0: |0-60|<=100; a1: |100-60|, |100-199| (201 is 101 away); a2: exact 0
    assert(pairs === Set(("a0", "b0"), ("a1", "b0"), ("a1", "b1"), ("a2", "b3")))
    // no duplicates from the 3-bucket explode
    val n = BandJoin.within(a, b, Seq("k"), "a_ts", "b_ts", width = 100L).count()
    assert(n === 4)
  }

  test("narrow band join matches the plain one, payload attached") {
    val a = Seq(("u1", 0L, "a0", "fat0", 1.5), ("u1", 100L, "a1", "fat1", 2.5),
        ("u2", 50L, "a2", "fat2", 3.5))
      .toDF("k", "a_ts", "a_id", "blob", "score")
    val b = Seq(("u1", 60L, "b0"), ("u1", 199L, "b1"), ("u1", 201L, "b2"),
        ("u2", 50L, "b3"))
      .toDF("k", "b_ts", "b_id")
    val plain = BandJoin.within(a, b, Seq("k"), "a_ts", "b_ts", 100L)
    val narrow = BandJoin.withinNarrow(a, b, Seq("k"), "a_ts", "b_ts", 100L,
      aId = "a_id")
    assert(narrow.columns.toSeq === plain.columns.toSeq)
    assert(narrow.collect().map(_.toSeq).toSet === plain.collect().map(_.toSeq).toSet)
    // payload columns actually came through
    val got = narrow.where($"a_id" === "a2").select("blob", "score")
      .as[(String, Double)].collect().toSeq
    assert(got === Seq(("fat2", 3.5)))
  }

  test("resample fails loudly when one key's span would explode the grid") {
    val df = Seq(("u1", 0L, 1.0), ("u1", 10000000000L, 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Resample.gapFill(df, Seq("k"), "ts", step = 1L,
        aggs = Seq("n" -> count(lit(1))), fills = Seq("n" -> lit(0L)),
        maxBucketsPerKey = 1000L).count()
    }
    assert(e.getMessage.contains("exceeds") || e.getCause != null)
  }

  test("asof rejects output-name collisions") {
    val l = Seq(("u1", 5L, "x")).toDF("k", "lts", "asof_reading")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.latestPrior(l, right, Seq("k"), "lts", "rts")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asof rejects reserved internal column names") {
    val l = Seq(("u1", 5L, "x")).toDF("k", "lts", "__side")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.latestPrior(l, right, Seq("k"), "lts", "rts")
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("asof sliced variant matches the windowed one on a hot key") {
    // one hot key with 500 interleaved rows spanning many slices, plus the
    // small fixture — slice width 7 cuts the hot key into ~30 slices, several
    // of them left-only (carry must bridge right-free slices)
    val hotLeft = (0 until 250).map(i => ("hot", i * 2L + 1L, s"h$i"))
    val hotRight = (0 until 100).map(i => ("hot", i * 5L, i.toDouble))
    val l = left.union(hotLeft.toDF("k", "lts", "id"))
    val r = right.union(hotRight.toDF("k", "rts", "reading"))
    val expect = AsOfJoin.latestPrior(l, r, Seq("k"), "lts", "rts")
      .select("k", "lts", "id", "asof_rts", "asof_reading")
      .collect().toSet
    val sliced = AsOfJoin.latestPriorSliced(l, r, Seq("k"), "lts", "rts",
        sliceWidth = 7L)
      .select("k", "lts", "id", "asof_rts", "asof_reading")
      .collect().toSet
    assert(sliced === expect)
    // tolerance path too
    val expectTol = AsOfJoin.latestPrior(l, r, Seq("k"), "lts", "rts",
        tolerance = Some(3L)).select("id", "asof_rts").collect().toSet
    val slicedTol = AsOfJoin.latestPriorSliced(l, r, Seq("k"), "lts", "rts",
        sliceWidth = 7L, tolerance = Some(3L))
      .select("id", "asof_rts").collect().toSet
    assert(slicedTol === expectTol)
  }

  test("resample fails loudly on null timestamps instead of dropping rows") {
    val df = Seq(("u1", Some(0L), 1.0), ("u1", None, 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Resample.gapFill(df, Seq("k"), "ts", step = 10L,
        aggs = Seq("n" -> count(lit(1))), fills = Seq("n" -> lit(0L))).count()
    }
    assert(e.getMessage.contains("null") || e.getCause != null)
  }

  test("resample gap-fills the per-key grid with defaults") {
    val df = Seq(("u1", 0L, 1.0), ("u1", 25L, 2.0), ("u2", 100L, 5.0))
      .toDF("k", "ts", "v")
    val out = Resample.gapFill(df, Seq("k"), "ts", step = 10L,
        aggs = Seq("n" -> count(lit(1)), "sv" -> sum("v")),
        fills = Seq("n" -> lit(0L), "sv" -> lit(0.0)))
      .select("k", "bucket_start", "n", "sv")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(out === Set(
      ("u1", 0L, 1L, 1.0), ("u1", 10L, 0L, 0.0), ("u1", 20L, 1L, 2.0),
      ("u2", 100L, 1L, 5.0)))
  }
}
