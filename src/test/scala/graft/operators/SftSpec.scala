package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SftSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 0, "user", "hi there"),
    (1L, 1, "assistant", "hello"),
    (1L, 2, "user", "bye"),
    (1L, 3, "assistant", "ok"),
    (2L, 0, "user", "solo")).toDF("conv_id", "idx", "role", "content")

  test("render: template assembly and character spans check out by hand") {
    val out = Sft.render(turns, "conv_id", "idx", "role", "content")
      .orderBy("conv_id")
      .as[(Long, String, Seq[(Long, Long)])].collect()
    val u = "<|user|>\n"; val a = "<|assistant|>\n"
    val t1 = s"${u}hi there\n${a}hello\n${u}bye\n${a}ok\n"
    assert(out(0)._2 === t1)
    // spans cover exactly the assistant CONTENT (tags/separators unmasked)
    val spans = out(0)._3
    assert(spans.map { case (s, e) => t1.substring(s.toInt, e.toInt) } ===
      Seq("hello", "ok"))
    assert(out(1)._2 === s"${u}solo\n" && out(1)._3.isEmpty)
  }

  test("render: spans index by characters, not bytes, on multibyte content") {
    val t = Seq((1L, 0, "user", "héllo ✓"), (1L, 1, "assistant", "naïve ✓"))
      .toDF("conv_id", "idx", "role", "content")
    val (text, spans) = Sft.render(t, "conv_id", "idx", "role", "content")
      .as[(Long, String, Seq[(Long, Long)])].head() match {
        case (_, tx, sp) => (tx, sp)
      }
    assert(spans.map { case (s, e) => text.substring(s.toInt, e.toInt) } ===
      Seq("naïve ✓"))
  }

  test("render: layout-invariant (repartitioned input renders identically)") {
    val a = Sft.render(turns, "conv_id", "idx", "role", "content")
      .orderBy("conv_id").as[(Long, String, Seq[(Long, Long)])].collect().toSeq
    val b = Sft.render(turns.repartition(7), "conv_id", "idx", "role", "content")
      .orderBy("conv_id").as[(Long, String, Seq[(Long, Long)])].collect().toSeq
    assert(a === b)
  }

  test("truncateToBudget keeps the fitting suffix; unfittable convs drop") {
    // conv 1 pieces render as 9+len+1 chars: "hi there"=18, "hello"=20,
    // "bye"=13, "ok"=17 (assistant tag is 14+len+1) — recompute: user tag
    // 9 chars, assistant tag 14. pieces: 18, 20, 13, 17; suffix sums from
    // the end: 17, 30, 50, 68
    val kept = Sft.truncateToBudget(turns, "conv_id", "idx", "role",
        "content", maxChars = 30)
      .where(col("conv_id") === 1L).select("idx").as[Int].collect().toSet
    assert(kept === Set(2, 3))
    // exact boundary included
    val exact = Sft.truncateToBudget(turns, "conv_id", "idx", "role",
        "content", maxChars = 17)
      .where(col("conv_id") === 1L).select("idx").as[Int].collect().toSet
    assert(exact === Set(3))
    // newest turn alone over budget: the conversation disappears
    val gone = Sft.truncateToBudget(turns, "conv_id", "idx", "role",
        "content", maxChars = 10)
      .where(col("conv_id") === 1L).count()
    assert(gone === 0L)
    // untouched conversations pass through whole and re-render identically
    val full = Sft.render(Sft.truncateToBudget(turns, "conv_id", "idx",
        "role", "content", maxChars = 1000), "conv_id", "idx", "role", "content")
      .orderBy("conv_id").as[(Long, String, Seq[(Long, Long)])].collect().toSeq
    val ref = Sft.render(turns, "conv_id", "idx", "role", "content")
      .orderBy("conv_id").as[(Long, String, Seq[(Long, Long)])].collect().toSeq
    assert(full === ref)
    // truncated conversations re-render with offsets rebased to the suffix
    val (text, spans) = Sft.render(Sft.truncateToBudget(turns, "conv_id",
        "idx", "role", "content", maxChars = 30), "conv_id", "idx", "role",
        "content").where(col("conv_id") === 1L)
      .as[(Long, String, Seq[(Long, Long)])].head() match {
        case (_, tx, sp) => (tx, sp)
      }
    assert(text === "<|user|>\nbye\n<|assistant|>\nok\n")
    assert(spans.map { case (s, e) => text.substring(s.toInt, e.toInt) } === Seq("ok"))
  }

  test("render: degenerate many-turn conversation assembles correctly " +
      "and truncateToBudget bounds it") {
    // the scaladoc'd memory bound: one conversation's text lives in ONE
    // aggregation buffer row — a 4k-turn conversation must still render
    // exactly (order, offsets, spans), and composing truncateToBudget
    // first is the sanctioned way to bound that buffer
    val n = 4096
    val big = spark.range(n).select(
      lit(7L).as("conv_id"), col("id").cast("int").as("idx"),
      when(col("id") % 2 === 0, "user").otherwise("assistant").as("role"),
      concat(lit("t"), col("id").cast("string")).as("content"))
    val (text, spans) = Sft.render(big, "conv_id", "idx", "role", "content")
      .as[(Long, String, Seq[(Long, Long)])].head() match {
        case (_, tx, sp) => (tx, sp)
      }
    // every piece present, in idx order, every span = its turn's content
    val expected = (0 until n).map { i =>
      (if (i % 2 == 0) "<|user|>\n" else "<|assistant|>\n") + s"t$i\n"
    }.mkString
    assert(text === expected)
    assert(spans.size === n / 2)
    assert(spans.forall { case (s, e) =>
      text.substring(s.toInt, e.toInt).matches("t\\d+") })
    // the sanctioned composition: a 200-char budget keeps only the
    // deepest fitting suffix, and the re-render's buffer is budget-bounded
    val fit = Sft.truncateToBudget(big, "conv_id", "idx", "role",
      "content", maxChars = 200L)
    val small = Sft.render(fit, "conv_id", "idx", "role", "content")
      .as[(Long, String, Seq[(Long, Long)])].head()
    assert(small._2.length <= 200 && small._2.nonEmpty)
    assert(text.endsWith(small._2)) // suffix rule: the tail survives
  }

  test("preferencePairs: best/worst per prompt with deterministic tie-breaks") {
    val cands = Seq(
      (10L, 1L, 5L), (10L, 2L, 9L), (10L, 3L, 1L), // clear order
      (20L, 4L, 7L), (20L, 5L, 7L),                // full tie
      (30L, 6L, 3L)).toDF("prompt_id", "cand", "score") // singleton: drops
    val out = Sft.preferencePairs(cands, "prompt_id", "cand", "score")
      .orderBy("prompt_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (10L, 2L, 9L, 3L, 1L, 3L),
      // tie: order by (score desc, cand asc) → chosen = lower id,
      // rejected = higher id — stable and distinct
      (20L, 4L, 7L, 5L, 7L, 2L)))
    // layout invariance
    val re = Sft.preferencePairs(cands.repartition(5), "prompt_id", "cand", "score")
      .orderBy("prompt_id").as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(re === out)
  }

  test("preferencePairs: null scores are excluded, never crowned") {
    // without the isNotNull filter, the null ordering field sorts FIRST in
    // Spark's struct ordering and a null-scored candidate deterministically
    // becomes `chosen` — the advisory case from round 15
    val cands = Seq(
      (10L, 1L, Some(5L)), (10L, 2L, None), (10L, 3L, Some(9L)),
      (20L, 4L, None), (20L, 5L, Some(7L)), // one scored cand: no pair
      (30L, 6L, None), (30L, 7L, None)      // all null: no pair
    ).toDF("prompt_id", "cand", "score")
    val out = Sft.preferencePairs(cands, "prompt_id", "cand", "score")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // prompt 10: nulls drop, pair = (3 score 9, 1 score 5), n_cands counts
    // only scored candidates; prompts 20/30 emit nothing
    assert(out === Seq((10L, 3L, 9L, 1L, 5L, 2L)))
  }

  test("preferencePairs: minMargin drops near-tie pairs, boundary inclusive") {
    val cands = Seq(
      (10L, 1L, 9L), (10L, 2L, 2L),  // margin 7: survives minMargin = 5
      (20L, 3L, 8L), (20L, 4L, 5L),  // margin 3: drops
      (30L, 5L, 6L), (30L, 6L, 1L)   // margin 5: AT the boundary — kept
    ).toDF("prompt_id", "cand", "score")
    val out = Sft.preferencePairs(cands, "prompt_id", "cand", "score",
        minMargin = 5.0)
      .orderBy("prompt_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (10L, 1L, 9L, 2L, 2L, 2L),
      (30L, 5L, 6L, 6L, 1L, 2L)))
    // default margin (0.0) keeps everything — q142's contract is unchanged
    val all = Sft.preferencePairs(cands, "prompt_id", "cand", "score")
      .count()
    assert(all === 3L)
    // a negative margin is a contract violation, not a wider filter
    val e = intercept[IllegalArgumentException](
      Sft.preferencePairs(cands, "prompt_id", "cand", "score", minMargin = -1.0))
    assert(e.getMessage.contains("minMargin"))
  }

  test("preferencePairs and bestOfN: a null candidate id fails loudly") {
    // null-first struct ordering would crown the null-id row on every tie
    // and ship chosen = null — structural corruption, not missing data
    val bad = Seq((10L, Option(1L), 5L), (10L, Option.empty[Long], 9L))
      .toDF("prompt_id", "cand", "score")
    val e1 = intercept[Exception](
      Sft.preferencePairs(bad, "prompt_id", "cand", "score").collect())
    assert(e1.getMessage.contains("null cand for prompt_id=10"))
    val e2 = intercept[Exception](
      Sft.bestOfN(bad, "prompt_id", "cand", "score", k = 1).collect())
    assert(e2.getMessage.contains("null cand for prompt_id=10"))
  }

  test("bestOfN: top-k with preferencePairs' tie-break and null exclusion") {
    val cands = Seq(
      (10L, 1L, Some(5L)), (10L, 2L, Some(9L)), (10L, 3L, Some(9L)),
      (10L, 4L, Some(1L)), (10L, 5L, None), // null never ranks
      (20L, 6L, Some(3L))).toDF("prompt_id", "cand", "score")
    val out = Sft.bestOfN(cands, "prompt_id", "cand", "score", k = 3)
      .orderBy("prompt_id", "rank")
      .select("prompt_id", "rank", "cand", "score")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // tie at 9: lower cand id first; rank 4 (cand 4) cut by k=3;
    // singleton prompts keep their one candidate (unlike pairs, a
    // best-of-1 set is still trainable)
    assert(out === Seq(
      (10L, 1, 2L, 9L), (10L, 2, 3L, 9L), (10L, 3, 1L, 5L),
      (20L, 1, 6L, 3L)))
    // a pre-existing rank column must fail loudly, never be overwritten
    val clash = Seq((1L, 1L, 1L, 9)).toDF("prompt_id", "cand", "score", "rank")
    val e = intercept[IllegalArgumentException](
      Sft.bestOfN(clash, "prompt_id", "cand", "score", k = 1))
    assert(e.getMessage.contains("rank"))
  }

  test("render and truncateToBudget: null content fails loudly") {
    // silent alternative: concat nulls the piece, the turn vanishes from
    // the text, but the mask span still emits with null offsets — a
    // corrupted training example; the guard raises instead
    val bad = Seq((1L, 0, "user", Option("hi")),
      (1L, 1, "assistant", Option.empty[String]))
      .toDF("conv_id", "idx", "role", "content")
    val e1 = intercept[Exception](
      Sft.render(bad, "conv_id", "idx", "role", "content").collect())
    assert(e1.getMessage.contains("null content for conv_id=1"))
    val e2 = intercept[Exception](
      Sft.truncateToBudget(bad, "conv_id", "idx", "role", "content",
        maxChars = 100).collect())
    assert(e2.getMessage.contains("null content for conv_id=1"))
  }

  test("render: extra roles via roleTags; unknown role fails loudly") {
    val t = Seq((1L, 0, "system", "be nice"), (1L, 1, "user", "q"),
      (1L, 2, "assistant", "a")).toDF("conv_id", "idx", "role", "content")
    val tags = Seq("system" -> "<|system|>\n", "user" -> "<|user|>\n",
      "assistant" -> "<|assistant|>\n")
    val (text, spans) = Sft.render(t, "conv_id", "idx", "role", "content",
        roleTags = tags).as[(Long, String, Seq[(Long, Long)])].head() match {
        case (_, tx, sp) => (tx, sp)
      }
    assert(text === "<|system|>\nbe nice\n<|user|>\nq\n<|assistant|>\na\n")
    assert(spans.map { case (s, e) => text.substring(s.toInt, e.toInt) } === Seq("a"))
    val bad = Seq((1L, 0, "tool", "x")).toDF("conv_id", "idx", "role", "content")
    val e = intercept[Exception] {
      Sft.render(bad, "conv_id", "idx", "role", "content").collect()
    }
    assert(e.getMessage.contains("unknown role"))
  }
}
