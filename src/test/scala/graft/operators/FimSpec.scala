package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FimSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 40L).map(i =>
    (i, (1 to 30).map(j => s"t${i}_$j").mkString(" ")))
    .toDF("doc_id", "text")

  test("PSM rearrangement reconstructs the document") {
    val rows = Fim.split(docs, "doc_id", "text").collect()
    assert(rows.exists(_.getBoolean(5)), "some docs must be FIM'd at 50%")
    assert(rows.exists(!_.getBoolean(5)), "some docs must pass through")
    rows.foreach { r =>
      val txt = r.getString(1)
      val orig = docs.where(col("doc_id") === r.getLong(0))
        .select(concat_ws(" ",
          graft.functions.TextFunctions.tokens(col("text"))))
        .as[String].head()
      if (r.getBoolean(5)) {
        val m = "<pre> ?(.*?) ?<suf> ?(.*?) ?<mid> ?(.*)".r
        val m(p, s, mi) = txt
        assert(Seq(p, mi, s).filter(_.nonEmpty).mkString(" ") === orig,
          s"doc ${r.getLong(0)}: P+M+S must tile the document")
        assert(r.getLong(2) + r.getLong(3) + r.getLong(4) === 30L)
      } else {
        assert(txt === orig)
        assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((30L, 0L, 0L)))
      }
    }
  }

  test("deterministic under repartition; seeds vary the splits") {
    def run(seed: Long, df: org.apache.spark.sql.DataFrame) =
      Fim.split(df, "doc_id", "text", seed).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run(5L, docs) === run(5L, docs.repartition(7)))
    assert(run(5L, docs) !== run(6L, docs))
  }

  test("splitMixed: SPM rearrangement also tiles; both modes occur ~50/50") {
    val many = (1L to 200L).map(i =>
      (i, (1 to 30).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Fim.splitMixed(many, "doc_id", "text").collect()
    val byMode = rows.groupBy(_.getString(6)).view.mapValues(_.length).toMap
    // ~100 applied docs split by an independent fair coin: both modes
    // present, neither below a quarter of the applied mass
    assert(byMode.keySet === Set("psm", "spm", "none"), byMode)
    val applied = byMode("psm") + byMode("spm")
    assert(byMode("psm") > applied / 4 && byMode("spm") > applied / 4, byMode)
    rows.foreach { r =>
      val orig = (1 to 30).map(j => s"t${r.getLong(0)}_$j").mkString(" ")
      r.getString(6) match {
        case "psm" =>
          val m = "<pre> ?(.*?) ?<suf> ?(.*?) ?<mid> ?(.*)".r
          val m(p, s, mi) = r.getString(1)
          assert(Seq(p, mi, s).filter(_.nonEmpty).mkString(" ") === orig)
        case "spm" =>
          val m = "<suf> ?(.*?) ?<pre> ?(.*?) ?<mid> ?(.*)".r
          val m(s, p, mi) = r.getString(1)
          assert(Seq(p, mi, s).filter(_.nonEmpty).mkString(" ") === orig,
            s"doc ${r.getLong(0)}: P+M+S must tile the document")
        case "none" =>
          assert(r.getString(1) === orig)
          assert(!r.getBoolean(5))
      }
    }
    // the non-mode columns agree with split(): the mode coin only
    // reorders segments, never moves the boundaries
    val plain = Fim.split(many, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    rows.foreach { r =>
      assert(plain(r.getLong(0)) ===
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
    }
  }

  test("single-token and empty docs pass through unapplied") {
    val edge = Seq((100L, "solo"), (101L, "")).toDF("doc_id", "text")
    Fim.split(edge, "doc_id", "text").collect().foreach { r =>
      assert(!r.getBoolean(5))
    }
  }
}
