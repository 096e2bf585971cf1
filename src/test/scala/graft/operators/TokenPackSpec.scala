package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenPackSpec extends SparkSpec {
  import spark.implicits._

  test("splits documents across sequences; exact lengths and boundaries") {
    val docs = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("d", "e")),
      (3L, Seq("f", "g", "h", "i"))
    ).toDF("doc_id", "pieces")
    val out = TokenPack.sequences(docs, "doc_id", "pieces", seqLen = 4)
      .orderBy("seq_id")
      .as[(Long, Seq[String], Seq[Int], Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, Seq("a", "b", "c", "d"), Seq(0, 3), 4L, 2L),
      (1L, Seq("e", "f", "g", "h"), Seq(1), 4L, 2L),
      (2L, Seq("i"), Seq(), 1L, 1L)))
  }

  test("empty-piece docs vanish; empty corpus returns an empty frame") {
    // null pieces behave like empty pieces: posexplode skips the row and
    // the doc contributes no tokens (the Chunk null-text convention)
    val docs = Seq((1L, Option(Seq("a"))), (2L, Option(Seq.empty[String])),
      (3L, Option.empty[Seq[String]])).toDF("doc_id", "pieces")
    val out = TokenPack.sequences(docs, "doc_id", "pieces", seqLen = 2)
      .as[(Long, Seq[String], Seq[Int], Long, Long)].collect().toSeq
    assert(out === Seq((0L, Seq("a"), Seq(0), 1L, 1L)))
    val none = Seq.empty[(Long, Seq[String])].toDF("doc_id", "pieces")
    assert(TokenPack.sequences(none, "doc_id", "pieces", seqLen = 2).isEmpty)
  }

  test("order-encoding guard refuses the exact overflow boundary") {
    // maxId * maxLen passes a product-only guard with equality, but the
    // last token's +pos still wraps past Long.MaxValue and would sort
    // FIRST — the guard must bound the full maxId*maxLen + (maxLen-1)
    val boundaryId = Long.MaxValue / 3
    val docs = Seq((boundaryId, Seq("a", "b", "c"))).toDF("doc_id", "pieces")
    val e = intercept[IllegalArgumentException] {
      TokenPack.sequences(docs, "doc_id", "pieces", seqLen = 2)
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }

  test("agrees with a sequential reference on random corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val L = 1 + rnd.nextInt(9)
      val docs = (0 until 40).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(7))(s"t${rnd.nextInt(5)}"))
      }
      val expected = {
        val stream = docs.sortBy(_._1).flatMap { case (id, ps) =>
          ps.zipWithIndex.map { case (p, j) => (id, p, j == 0) } }
        stream.zipWithIndex.groupBy(_._2 / L).toSeq.sortBy(_._1).map {
          case (sid, rows) =>
            (sid.toLong, rows.map(_._1._2),
              rows.filter(_._1._3).map(_._2 % L),
              rows.size.toLong, rows.map(_._1._1).distinct.size.toLong)
        }
      }
      val got = TokenPack
        .sequences(docs.toDF("doc_id", "pieces"), "doc_id", "pieces", L,
          subStrata = 1 + rnd.nextInt(5))
        .orderBy("seq_id")
        .as[(Long, Seq[String], Seq[Int], Long, Long)].collect().toSeq
      assert(got === expected, s"trial $trial seqLen $L")
    }
  }

  test("BPE composition: tokens conserved, all-but-last sequences full") {
    val corpus = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest widest"),
      (3L, "the newest low")).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 10)
    val enc = Bpe.encode(corpus, "doc_id", "text", merges)
    val total = enc.agg(sum(size(col("pieces")))).head.getLong(0)
    val seqs = TokenPack.sequences(enc, "doc_id", "pieces", seqLen = 8)
      .orderBy("seq_id")
      .as[(Long, Seq[String], Seq[Int], Long, Long)].collect().toSeq
    assert(seqs.map(_._4).sum === total, "token conservation")
    assert(seqs.dropRight(1).forall(_._4 === 8L), "all but last full")
    assert(seqs.forall(s => s._3 == s._3.sorted && s._3.forall(o => o >= 0 && o < 8)))
    // decoding the packed stream reproduces the concatenated corpus
    val packed = seqs.flatMap(_._2)
    val direct = enc.orderBy("doc_id")
      .as[(Long, Seq[String])].collect().toSeq.flatMap(_._2)
    assert(packed === direct)
  }
}
