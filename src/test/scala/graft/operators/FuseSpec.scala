package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuseSpec extends SparkSpec {
  import spark.implicits._

  private def runA = Seq(
    (1L, 100L, 1), (1L, 101L, 2), (1L, 102L, 3),
    (2L, 200L, 1), (2L, 201L, 2)
  ).toDF("q_id", "item", "rank")

  private def runB = Seq(
    (1L, 101L, 1), (1L, 103L, 2),
    (2L, 201L, 1), (2L, 200L, 2)
  ).toDF("q_id", "item", "rank")

  test("rrf matches hand-computed reciprocal rank sums") {
    val got = Fuse.rrf(Seq(runA, runB), "q_id", "item", "rank", k = 10)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def rr(ranks: Int*) = ranks
      .map(r => BigDecimal(1.0 / (60 + r))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      .toDouble
    assert(got((1L, 101L)) == rr(2, 1), "item in both runs sums both")
    assert(got((1L, 100L)) == rr(1), "item in one run contributes once")
    assert(got((1L, 103L)) == rr(2))
    assert(got((2L, 200L)) == rr(1, 2))
  }

  test("items in both runs outrank single-run items at similar ranks") {
    val fused = Fuse.rrf(Seq(runA, runB), "q_id", "item", "rank", k = 10)
      .where(col("q_id") === 1L).orderBy("rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(fused.head._2 == 101L, "101 is rank 2 + rank 1 — the consensus pick")
  }

  test("k caps per query and ties break by ascending item id") {
    val t1 = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_id", "item", "rank")
    val t2 = Seq((1L, 11L, 1), (1L, 10L, 2)).toDF("q_id", "item", "rank")
    // both items end with 1/61 + 1/62 — a true tie
    val fused = Fuse.rrf(Seq(t1, t2), "q_id", "item", "rank", k = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(fused.length == 1)
    assert(fused.head._2 == 10L, "tie broken by item id")
  }

  test("single-run fusion preserves the run's order") {
    val fused = Fuse.rrf(Seq(runA), "q_id", "item", "rank", k = 10)
      .where(col("q_id") === 1L).orderBy("rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(fused.map(_._2).toSeq == Seq(100L, 101L, 102L))
  }

  test("linear fusion: min-max per query, weights, hand-computed sums") {
    // run A scores 10/5/0 normalize to 1.0/0.5/0.0; run B 2/1 to 1.0/0.0
    val a = Seq((1L, 100L, 10.0), (1L, 101L, 5.0), (1L, 102L, 0.0))
      .toDF("q_id", "item", "score")
    val b = Seq((1L, 101L, 2.0), (1L, 103L, 1.0)).toDF("q_id", "item", "score")
    val got = Fuse.linear(Seq(a -> 0.7, b -> 0.3), "q_id", "item", "score", k = 10)
      .as[(Long, Long, Double, Int)].collect().map(r => r._2 -> (r._3, r._4)).toMap
    assert(got(101L) === ((0.65, 2)), // 0.7*0.5 + 0.3*1.0
      s"cross-run item: ${got(101L)}")
    assert(got(100L) === ((0.7, 1)))
    assert(got(103L)._1 === 0.0 || got(103L)._1 === 0.0) // worst of run B
    assert(got(102L)._1 === 0.0)
  }

  test("linear fusion: constant score list normalizes to 1.0, not NaN") {
    val a = Seq((1L, 100L, 3.0), (1L, 101L, 3.0)).toDF("q_id", "item", "score")
    val got = Fuse.linear(Seq(a -> 1.0), "q_id", "item", "score", k = 10)
      .as[(Long, Long, Double, Int)].collect().map(r => r._2 -> r._3).toMap
    assert(got(100L) === 1.0 && got(101L) === 1.0)
  }

  test("linear fusion: runs longer than k are truncated before normalization") {
    // 4-row run, k = 2: the contract normalizes over the per-query top-2
    // (scores 10, 8 → 1.0, 0.0), NOT over the full list's 10..0 range
    val long = Seq((1L, 100L, 10.0), (1L, 101L, 8.0), (1L, 102L, 4.0),
      (1L, 103L, 0.0)).toDF("q_id", "item", "score")
    val got = Fuse.linear(Seq(long -> 1.0), "q_id", "item", "score", k = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.length === 2, "tail rows beyond k must not survive")
    val byItem = got.map(r => r._2 -> r._3).toMap
    assert(byItem(100L) === 1.0 && byItem(101L) === 0.0,
      s"min/max must come from the top-k slice, got $byItem")
  }

  test("linear fusion: a decisive margin outvotes a flat run — unlike RRF") {
    // dense says 100 wins by a mile; sparse mildly prefers 101. RRF (ranks
    // only) would tie them 1/61+1/62 each; linear fusion must not.
    val dense = Seq((1L, 100L, 0.99), (1L, 101L, 0.10)).toDF("q_id", "item", "score")
    val sparse = Seq((1L, 101L, 5.1), (1L, 100L, 5.0)).toDF("q_id", "item", "score")
    val lin = Fuse.linear(Seq(sparse -> 0.5, dense -> 0.5), "q_id", "item", "score", k = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(lin.head._2 === 100L, "magnitude information must decide")
  }
}
