package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  // strata of very different sizes (one smaller than subStrata), scrambled
  // insertion order, weights 1..60
  private def corpus = {
    val rows = (0 until 3000).map { i =>
      val lang = if (i % 600 == 0) "tiny" else s"l${i % 3}"
      (lang, (i * 7919 % 100000).toLong, (i * 37 % 60 + 1).toLong)
    }.distinct
    rows.toDF("lang", "doc_id", "n_tok").repartition(8)
  }

  private def singleWindowRef(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("lang").orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("win", expr("(cum - n_tok) DIV 512"))
  }

  test("tokenWindows equals the single-window packing exactly") {
    for (sub <- Seq(1, 4, 32)) {
      val got = Pack.tokenWindows(corpus, "lang", "doc_id", "n_tok",
          budget = 512, subStrata = sub)
        .select("lang", "doc_id", "n_tok", "cum", "win")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val ref = singleWindowRef(corpus)
        .select("lang", "doc_id", "n_tok", "cum", "win")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got === ref, s"subStrata=$sub diverged from the single window")
    }
  }

  test("slices are order-preserving and actually split big strata") {
    val sliced = Pack.assignSlices(corpus, "lang", "doc_id", 8)
      .select("lang", "doc_id", "__sub")
      .as[(String, Long, Int)].collect()
    // a big stratum splits into many parallel slices
    val l0 = sliced.filter(_._1 == "l0")
    assert(l0.map(_._3).distinct.length >= 4,
      s"big stratum used only ${l0.map(_._3).distinct.length} slices")
    // order-preserving: every row in slice s sorts before every row in s+1
    for ((_, rows) <- sliced.groupBy(_._1)) {
      val bySub = rows.groupBy(_._3).toSeq.sortBy(_._1)
      bySub.sliding(2).foreach {
        case Seq((_, lo), (_, hi)) =>
          assert(lo.map(_._2).max <= hi.map(_._2).min,
            "slice ranges overlap — packing order broken")
        case _ =>
      }
    }
  }

  test("budget edge cases: single row bigger than budget; empty stratum never emitted") {
    val df = Seq(("a", 1L, 2000L), ("a", 2L, 10L), ("a", 3L, 10L))
      .toDF("lang", "doc_id", "n_tok")
    val got = Pack.tokenWindows(df, "lang", "doc_id", "n_tok", budget = 512, subStrata = 4)
      .select("doc_id", "cum", "win").as[(Long, Long, Long)].collect().toSet
    // doc 1 starts at 0 -> win 0 (overflows); doc 2 starts at 2000 -> win 3
    assert(got === Set((1L, 2000L, 0L), (2L, 2010L, 3L), (3L, 2020L, 3L)))
  }
}
