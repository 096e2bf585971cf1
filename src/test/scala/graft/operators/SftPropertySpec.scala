package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized driver-local references for the alignment-prep family
  * (the round-14 "randomized-reference closure" convention: every family
  * carries a brute-force fuzz beside its oracle gate — the fuzz covers
  * structural properties the hash gate cannot, like arbitrary role mixes
  * and multibyte contents the seeded corpus never produces).
  */
class SftPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val roleTagSeq = Seq("system" -> "<|system|>\n",
    "user" -> "<|user|>\n", "assistant" -> "<|assistant|>\n")
  private val tagMap = roleTagSeq.toMap
  private val contentGen = Gen.listOfN(6,
    Gen.oneOf("a", "bb", "©x", "汉字", "eé", "", "z 9")).map(_.mkString(" "))

  private def convGen(conv: Long): Gen[Seq[(Long, Long, String, String)]] =
    for {
      n <- Gen.choose(1, 7)
      roles <- Gen.listOfN(n, Gen.oneOf(roleTagSeq.map(_._1)))
      contents <- Gen.listOfN(n, contentGen)
    } yield roles.zip(contents).zipWithIndex.map {
      case ((r, c), i) => (conv, i.toLong, r, c)
    }

  test("render: every span extracts its turn's content; layout matches a local rebuild") {
    (1L to 8L).foreach { seed =>
      val turns = (0L until 5L).flatMap(c => sample(convGen(c), seed * 31 + c))
      val out = Sft.render(turns.toDF("conv", "idx", "role", "content"),
          "conv", "idx", "role", "content", roleTags = roleTagSeq)
        .as[(Long, String, Seq[(Long, Long)])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // driver-local reference: straight string building in idx order
      turns.groupBy(_._1).foreach { case (conv, rows) =>
        val ordered = rows.sortBy(_._2)
        val expectText = ordered.map { case (_, _, r, c) => tagMap(r) + c + "\n" }.mkString
        val (text, spans) = out(conv)
        assert(text === expectText, s"seed=$seed conv=$conv")
        // spans are exactly the assistant contents, in order
        val expectSpans = ordered.filter(_._3 == "assistant").map(_._4)
        assert(spans.map { case (s, e) => text.substring(s.toInt, e.toInt) }
          === expectSpans, s"seed=$seed conv=$conv")
      }
    }
  }

  test("truncateToBudget: survivors are exactly the deepest fitting suffix") {
    (1L to 8L).foreach { seed =>
      val turns = (0L until 6L).flatMap(c => sample(convGen(c), seed * 17 + c))
      val budget = 10L + (seed % 5) * 15L
      val kept = Sft.truncateToBudget(
          turns.toDF("conv", "idx", "role", "content"),
          "conv", "idx", "role", "content", maxChars = budget, roleTags = roleTagSeq)
        .as[(Long, Long, String, String)].collect()
        .groupBy(_._1).map { case (c, rs) => c -> rs.map(_._2).sorted.toSeq }
      turns.groupBy(_._1).foreach { case (conv, rows) =>
        val ordered = rows.sortBy(_._2)
        // local reference: longest suffix whose rendered length fits
        val lens = ordered.map { case (_, _, r, c) =>
          (tagMap(r) + c + "\n").length.toLong }
        val suffixes = ordered.indices.map(i => lens.drop(i).sum)
        val firstFit = suffixes.indexWhere(_ <= budget)
        val expect =
          if (firstFit < 0) Seq.empty else ordered.drop(firstFit).map(_._2)
        assert(kept.getOrElse(conv, Seq.empty) === expect,
          s"seed=$seed conv=$conv budget=$budget")
      }
    }
  }

  test("preferencePairs and bestOfN agree with the sorted reference") {
    (1L to 8L).foreach { seed =>
      val rows = sample(Gen.listOfN(60, Gen.zip(
        Gen.choose(0L, 7L), Gen.option(Gen.choose(0L, 4L)))), seed)
        .zipWithIndex.map { case ((p, s), i) => (p, i.toLong, s) }
      val df = rows.toDF("prompt", "cand", "score")
      val byPrompt = rows.collect { case (p, c, Some(s)) => (p, c, s) }
        .groupBy(_._1).map { case (p, rs) =>
          p -> rs.sortBy(r => (-r._3, r._2)).toSeq }
      val pairs = Sft.preferencePairs(df, "prompt", "cand", "score")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      byPrompt.foreach { case (p, sorted) =>
        if (sorted.size >= 2) {
          val got = pairs(p)
          assert((got._2, got._3) === ((sorted.head._2, sorted.head._3)), s"seed=$seed p=$p chosen")
          assert((got._4, got._5) === ((sorted.last._2, sorted.last._3)), s"seed=$seed p=$p rejected")
          assert(got._6 === sorted.size, s"seed=$seed p=$p n_cands")
        } else assert(!pairs.contains(p), s"seed=$seed p=$p singleton emitted")
      }
      val top = Sft.bestOfN(df, "prompt", "cand", "score", k = 2)
        .select("prompt", "rank", "cand", "score")
        .as[(Long, Int, Long, Long)].collect()
        .groupBy(_._1).map { case (p, rs) =>
          p -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
      byPrompt.foreach { case (p, sorted) =>
        assert(top.getOrElse(p, Seq.empty)
          === sorted.take(2).map(r => (r._2, r._3)), s"seed=$seed p=$p top-k")
      }
    }
  }
}
