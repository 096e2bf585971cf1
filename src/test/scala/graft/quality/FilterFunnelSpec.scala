package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FilterFunnelSpec extends SparkSpec {
  import spark.implicits._

  // (id, len, tok) hand-designed attribution:
  //   rule0 len >= 3   removes a (len 2)
  //   rule1 len <= 9   removes b (len 12) — even though b also fails rule2
  //   rule2 tok >= 10  removes c (tok 5)
  //   d, e survive
  private def docs = Seq(
    ("a", 2, 100L), ("b", 12, 3L), ("c", 5, 5L), ("d", 5, 20L),
    ("e", 9, 30L)
  ).toDF("id", "len", "tok")

  private def rules = Seq(
    "min_len" -> (col("len") >= 3),
    "max_len" -> (col("len") <= 9),
    "min_tok" -> (col("tok") >= 10L))

  test("first-failing attribution, in/out bookkeeping, token mass") {
    val rows = FilterFunnel.funnel(docs, rules, col("tok"))
      .as[(Int, String, Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect()
    assert(rows.map(_._2).toSeq === Seq("min_len", "max_len", "min_tok"))
    // min_len: 5 in, removes a(100), 4 out
    assert(rows(0)._3 === 5L && rows(0)._4 === 1L && rows(0)._5 === 4L)
    assert(rows(0)._6 === 158L && rows(0)._7 === 100L && rows(0)._8 === 58L)
    // max_len: 4 in, removes b(3) — b is NOT double-counted at min_tok
    assert(rows(1)._3 === 4L && rows(1)._4 === 1L && rows(1)._5 === 3L)
    assert(rows(1)._7 === 3L && rows(1)._8 === 55L)
    // min_tok: 3 in, removes c(5), 2 survive with 50 tokens
    assert(rows(2)._3 === 3L && rows(2)._4 === 1L && rows(2)._5 === 2L)
    assert(rows(2)._7 === 5L && rows(2)._8 === 50L)
    assert(rows(0)._9 === Some(0.2))
  }

  test("a null predicate result rejects (conservative release semantics)") {
    val d = Seq(("a", Some(5)), ("b", None: Option[Int]))
      .toDF("id", "len")
    val rows = FilterFunnel.funnel(d,
        Seq("min_len" -> (col("len") >= 3)), lit(1L))
      .select("n_in", "n_removed", "n_out")
      .as[(Long, Long, Long)].collect()
    assert(rows(0) === ((2L, 1L, 1L)))
  }

  test("zero-removal rules emit zero rows and pass mass through") {
    val rows = FilterFunnel.funnel(docs,
        Seq("noop" -> lit(true)) ++ rules, col("tok"))
      .select("rule", "n_in", "n_removed", "n_out", "frac_docs_removed")
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(rows(0) === (("noop", 5L, 0L, 5L, Some(0.0))))
    // downstream attribution unchanged
    assert(rows(1)._3 === 1L && rows(2)._3 === 1L && rows(3)._3 === 1L)
  }

  test("empty input keeps the K rows with null fractions") {
    val rows = FilterFunnel.funnel(docs.where(lit(false)), rules, col("tok"))
      .select("n_in", "n_removed", "n_out", "frac_docs_removed")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(rows.length === 3)
    assert(rows.forall(_ == ((0L, 0L, 0L, None))))
  }

  test("duplicate rule names are rejected loudly") {
    intercept[IllegalArgumentException] {
      FilterFunnel.funnel(docs,
        Seq("r" -> lit(true), "r" -> lit(false)), col("tok"))
    }
  }

  test("funnel equals running the rules sequentially (randomized)") {
    val rnd = new scala.util.Random(77)
    val d = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(20), rnd.nextInt(50).toLong))
      .toDF("id", "len", "tok")
    val rs = Seq(
      "r0" -> (col("len") >= 2),
      "r1" -> (col("len") <= 15),
      "r2" -> (col("tok") >= 5L),
      "r3" -> ((col("len") + col("tok")) % 7 =!= 0))
    val got = FilterFunnel.funnel(d, rs, col("tok"))
      .select("rule", "n_in", "n_removed", "n_out", "tokens_out")
      .as[(String, Long, Long, Long, Long)].collect()
    var surv = d
    rs.zip(got).foreach { case ((name, pred), row) =>
      val nIn = surv.count()
      surv = surv.where(coalesce(pred, lit(false)))
      val nOut = surv.count()
      val tokOut = surv.agg(sum("tok")).as[Option[Long]].head.getOrElse(0L)
      assert(row === ((name, nIn, nIn - nOut, nOut, tokOut)),
        s"rule $name diverges from the sequential run")
    }
  }
}
