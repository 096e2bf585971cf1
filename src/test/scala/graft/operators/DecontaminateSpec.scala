package graft.operators

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def bench = Seq(
    (0L, "alpha beta gamma delta epsilon")
  ).toDF("doc_id", "text")

  private def train = Seq(
    (10L, "x alpha beta gamma delta y"),          // shares 1 bench shingle
    (11L, "completely different words here now"), // clean
    (12L, "alpha beta gamma delta epsilon zeta"), // shares both bench shingles
    (13L, "too short")                            // < n tokens → no shingles
  ).toDF("doc_id", "text")

  test("overlap counts distinct shared shingles per contaminated doc") {
    val out = Decontaminate.overlap(train, bench, "doc_id", "text", shingleN = 4)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(10L -> 1L, 12L -> 2L))
  }

  test("clean removes exactly the contaminated docs") {
    val kept = Decontaminate.clean(train, bench, "doc_id", "text", shingleN = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L, 13L))
  }

  test("report: counts, fractions, and the no-shingle contract") {
    val out = Decontaminate.report(train, bench, "doc_id", "text", shingleN = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 10: 3 distinct 4-grams, 1 shared; doc 12: 3, 2 shared
    assert(out(10L) === ((3L, 1L, 0.333333)))
    assert(out(12L) === ((3L, 2L, 0.666667)))
    assert(out(11L) === ((2L, 0L, 0.0)), "clean doc reports zeros")
    assert(out(13L) === ((0L, 0L, 0.0)), "short doc reports 0, not null/NaN")
  }

  test("cleanByFraction keeps quoting docs the hard rule would drop") {
    // threshold 0.5: doc 10 (1/3 contaminated) survives, doc 12 (2/3) dies
    val kept = Decontaminate
      .cleanByFraction(train, bench, "doc_id", "text", maxFrac = 0.5, shingleN = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(10L, 11L, 13L))
    // threshold 0 = the hard rule
    val hard = Decontaminate
      .cleanByFraction(train, bench, "doc_id", "text", maxFrac = 0.0, shingleN = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(hard === Set(11L, 13L))
  }

  test("matches the un-pruned semi join on real data") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val b = docs.where(col("doc_id") % 29 === 0)
    val tr = docs.where(col("doc_id") % 29 =!= 0)
    val pruned = Decontaminate.overlap(tr, b, "doc_id", "text", shingleN = 4)
    val bs = b.select(explode(shingleSetFast(col("text"), 4)).as("s")).distinct()
    val plain = tr.select(col("doc_id"), explode(shingleSetFast(col("text"), 4)).as("s"))
      .join(bs, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    assert(pruned.count() > 0, "sf0.001 should have contaminated docs")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("cache registry is keyed by bench set — repeat calls don't grow it") {
    Decontaminate.releaseCaches()
    Decontaminate.overlap(train, bench, "doc_id", "text", shingleN = 4).count()
    Decontaminate.overlap(train, bench, "doc_id", "text", shingleN = 4).count()
    Decontaminate.overlap(train, bench, "doc_id", "text", shingleN = 4).count()
    assert(Decontaminate.cacheCount === 1,
      "same bench set must reuse one cache entry")
    // a DIFFERENT shingle width is a different bench-shingle set
    Decontaminate.overlap(train, bench, "doc_id", "text", shingleN = 3).count()
    assert(Decontaminate.cacheCount === 2)
    Decontaminate.releaseCaches()
    assert(Decontaminate.cacheCount === 0)
  }
}
