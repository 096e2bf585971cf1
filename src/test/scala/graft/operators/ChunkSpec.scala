package graft.operators

import graft.SparkSpec

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  test("slidingTokens: boundaries, overlap and the short final chunk by hand") {
    // n=10, chunk=5, stride=3 -> starts 0,3,6: [1..5], [4..8], [7..10]
    val out = Chunk.slidingTokens(Seq((1L, toks(10))).toDF("id", "text"),
        "id", "text", chunkTokens = 5, stride = 3)
      .orderBy("chunk_id")
      .select("chunk_id", "n_chunks", "tok_start", "tok_len", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (0L, 3L, 0L, 5L, "t1 t2 t3 t4 t5"),
      (1L, 3L, 3L, 5L, "t4 t5 t6 t7 t8"),
      (2L, 3L, 6L, 4L, "t7 t8 t9 t10")))
  }

  test("slidingTokens: exact fit is one chunk; shorter docs too; empty drops") {
    // null text behaves like empty: tokens(null) is null, size(null) is
    // null under Spark 3+ semantics, and the >= 1 guard drops the row —
    // a null document emits no chunks, same as a whitespace-only one
    val docs = Seq((1L, Option(toks(5))), (2L, Option(toks(2))),
      (3L, Option("  ")), (4L, Option.empty[String])).toDF("id", "text")
    val out = Chunk.slidingTokens(docs, "id", "text", 5, 3)
      .select("id", "n_chunks", "tok_len").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    assert(out === Seq((1L, 1L, 5L), (2L, 1L, 2L)))
  }

  test("slidingTokens: every token is covered; no chunk starts past the end") {
    for (n <- 1 to 40; (c, s) <- Seq((8, 8), (8, 5), (8, 1), (3, 2))) {
      val rows = Chunk.slidingTokens(Seq((1L, toks(n))).toDF("id", "text"),
          "id", "text", c, s)
        .select("tok_start", "tok_len").as[(Long, Long)].collect()
      val covered = rows.flatMap { case (st, ln) => st until (st + ln) }.toSet
      assert(covered === (0L until n.toLong).toSet, s"n=$n c=$c s=$s")
      assert(rows.forall { case (st, ln) => st < n && ln >= 1 }, s"n=$n c=$c s=$s")
      // overlap rule: consecutive starts differ by exactly the stride
      val starts = rows.map(_._1).sorted
      assert(starts.zip(starts.drop(1)).forall { case (a, b) => b - a == s },
        s"n=$n c=$c s=$s")
    }
  }

  test("slidingTokens rejects degenerate geometry and column collisions") {
    val d = Seq((1L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException](Chunk.slidingTokens(d, "id", "text", 0, 1))
    intercept[IllegalArgumentException](Chunk.slidingTokens(d, "id", "text", 4, 5))
    val clash = Seq((1L, "a b c", 9L)).toDF("id", "text", "chunk_id")
    val e = intercept[IllegalArgumentException](
      Chunk.slidingTokens(clash, "id", "text", 4, 2))
    assert(e.getMessage.contains("chunk_id"))
  }
}
