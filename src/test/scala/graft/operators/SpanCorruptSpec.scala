package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, (1 to 200).map(i => s"tok$i").mkString(" ")),
    (2L, "short doc with a handful of tokens only"),
    (3L, "")
  ).toDF("doc_id", "text")

  private val sentinel = "<extra_id_(\\d+)>".r

  test("output reconstructs the document: sentinels splice target spans back") {
    val rows = SpanCorrupt.corrupt(docs, "doc_id", "text", seed = 7L)
      .join(docs, "doc_id")
      .select(col("doc_id"), col("input_text"), col("target_text"),
        concat_ws(" ", graft.functions.TextFunctions.tokens(col("text")))
          .as("norm"))
      .collect()
    rows.foreach { r =>
      val (inp, tgt, norm) =
        (r.getString(1), r.getString(2), r.getString(3))
      // split the target on sentinels -> span k's tokens
      val spans = sentinel.split(tgt).map(_.trim).filter(_.nonEmpty)
      val sentinelIds = sentinel.findAllMatchIn(tgt).map(_.group(1).toInt).toSeq
      assert(sentinelIds == sentinelIds.indices.toSeq,
        s"target sentinels must be 0..n in order: $sentinelIds")
      val rebuilt = inp.split(" ").filter(_.nonEmpty).flatMap {
        case s if s.startsWith("<extra_id_") =>
          val k = sentinel.findFirstMatchIn(s).get.group(1).toInt
          spans(k).split(" ")
        case t => Array(t)
      }.mkString(" ")
      assert(rebuilt == norm, s"doc ${r.getLong(0)} does not reconstruct")
    }
  }

  test("corruption rate lands near (maxSpan+1)/(2*startPeriod)") {
    val big = spark.range(50).select(col("id").as("doc_id"),
      lit((1 to 400).map(i => s"w$i").mkString(" ")).as("text"))
    val agg = SpanCorrupt.corrupt(big, "doc_id", "text", seed = 1L)
      .agg(sum("n_masked").cast("double").as("m"), sum("n_spans").as("s"))
      .head()
    val rate = agg.getDouble(0) / (50.0 * 400)
    assert(rate > 0.10 && rate < 0.20, s"rate $rate far from 0.15")
  }

  test("deterministic under repartition and re-run") {
    val a = SpanCorrupt.corrupt(docs, "doc_id", "text", seed = 3L)
      .orderBy("doc_id").collect().toSeq
    val b = SpanCorrupt.corrupt(docs.repartition(7), "doc_id", "text", seed = 3L)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("counting invariants: masked + visible = total; sentinels = spans") {
    val out = SpanCorrupt.corrupt(docs, "doc_id", "text", seed = 7L)
      .join(docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("nt")),
        "doc_id").collect()
    out.foreach { r =>
      val inp = r.getString(1)
      val nMasked = r.getLong(3); val nSpans = r.getLong(4)
      val inpToks = inp.split(" ").filter(_.nonEmpty)
      val nSent = inpToks.count(_.startsWith("<extra_id_"))
      assert(nSent.toLong == nSpans)
      assert((inpToks.length - nSent) + nMasked == r.getInt(5).toLong)
    }
  }

  test("empty document yields empty pair, not a dropped row") {
    val r = SpanCorrupt.corrupt(docs, "doc_id", "text")
      .where(col("doc_id") === 3L).collect().head
    assert(r.getString(1) == "" && r.getString(2) == "" &&
      r.getLong(3) == 0L && r.getLong(4) == 0L)
  }
}
