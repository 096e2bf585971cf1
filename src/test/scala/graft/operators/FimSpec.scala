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

  test("single-token and empty docs pass through unapplied") {
    val edge = Seq((100L, "solo"), (101L, "")).toDF("doc_id", "text")
    Fim.split(edge, "doc_id", "text").collect().foreach { r =>
      assert(!r.getBoolean(5))
    }
  }
}
