package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class MixSpec extends SparkSpec {
  import spark.implicits._

  // two sources: 'web' docs of 100 tokens each, 'books' of 300 each
  private def corpus = ((0 until 50).map(i => (i.toLong, "web", 100L)) ++
    (0 until 10).map(i => (1000L + i, "books", 300L)))
    .toDF("doc_id", "source", "n_tok").repartition(4)

  test("capTokens keeps each source's prefix under its budget; starts-under rule") {
    val budgets = Seq(("web", 1050L), ("books", 600L)).toDF("source", "budget")
    val kept = Mix.capTokens(corpus, "source", "doc_id", "n_tok", budgets)
      .select("doc_id").as[Long].collect().toSet
    // web: docs start at cum-100 = 0,100,...  doc 10 starts at 1000 < 1050
    // → kept (overrun by one doc); doc 11 starts at 1100 → dropped
    assert(kept.count(_ < 1000L) === 11)
    assert(kept.filter(_ < 1000L) === (0L until 11L).toSet, "doc_id order admission")
    // books: doc 1000 starts 0, 1001 starts 300 < 600, 1002 starts 600 → out
    assert(kept.filter(_ >= 1000L) === Set(1000L, 1001L))
  }

  test("strata absent from the budget table are kept in full") {
    val budgets = Seq(("web", 500L)).toDF("source", "budget")
    val kept = Mix.capTokens(corpus, "source", "doc_id", "n_tok", budgets)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.count(_ >= 1000L) === 10, "uncapped books all kept")
    assert(kept.count(_ < 1000L) === 5)
  }

  test("interleave: per-stratum ranks; (pos, source) order cycles the sources") {
    for (sub <- Seq(1, 8)) {
      val out = Mix.interleave(corpus, "source", "doc_id", subStrata = sub)
        .select("doc_id", "source", "pos")
        .as[(Long, String, Long)].collect()
      val byDoc = out.map(r => r._1 -> r._3).toMap
      // ranks are 1..n within each source, in doc_id order
      for (i <- 0 until 50) assert(byDoc(i.toLong) === i + 1L, s"web doc $i sub=$sub")
      for (i <- 0 until 10) assert(byDoc(1000L + i) === i + 1L, s"book doc $i sub=$sub")
      // epoch order: while both strata last, each cycle holds one of each
      val epoch = out.sortBy(r => (r._3, r._2)).take(20).map(_._2)
      assert(epoch.grouped(2).forall(_.toSet === Set("web", "books")),
        s"first 10 cycles must alternate sources, got ${epoch.mkString(",")}")
    }
  }

  test("temperatureBudgets: alpha=1 is natural proportions, alpha<1 flattens") {
    // web 5000 tokens, books 3000
    def budgets(alpha: Double) =
      Mix.temperatureBudgets(corpus, "source", "n_tok", alpha, 1000L)
        .select("source", "n_tokens", "p", "budget")
        .as[(String, Long, Double, Long)].collect()
        .map(r => r._1 -> r).toMap
    val nat = budgets(1.0)
    assert(nat("web") === (("web", 5000L, 0.625, 625L)))
    assert(nat("books") === (("books", 3000L, 0.375, 375L)))
    val sq = budgets(0.5) // sqrt weights: 70.71 / 54.77
    assert(sq("web") === (("web", 5000L, 0.563508, 563L)))
    assert(sq("books") === (("books", 3000L, 0.436492, 436L)))
    // flattening is monotone in alpha
    val flat = budgets(0.1)
    assert(math.abs(flat("web")._3 - 0.5) < math.abs(sq("web")._3 - 0.5))
    assert(math.abs(sq("web")._3 - 0.5) < math.abs(nat("web")._3 - 0.5))
  }

  test("temperature budgets feed capTokens directly") {
    val b = Mix.temperatureBudgets(corpus, "source", "n_tok", 0.5, 1000L)
    val kept = Mix.capTokens(corpus, "source", "doc_id", "n_tok",
        b.select("source", "budget"))
      .select("doc_id").as[Long].collect().toSet
    // web budget 563: docs start at 0,100,...,500 -> 6 admitted
    assert(kept.count(_ < 1000L) === 6)
    // books budget 436: starts 0, 300 -> 2 admitted
    assert(kept.filter(_ >= 1000L) === Set(1000L, 1001L))
  }

  test("upsampleTokens repeats under-supplied strata in whole epochs") {
    // books supply 3000, budget 7000 -> 3 epochs: two full + 4 docs of the
    // third (starts 6000/6300/6600/6900 all under 7000); web budget 500 ->
    // plain epoch-0 prefix of 5 docs
    val budgets = Seq(("books", 7000L), ("web", 500L)).toDF("source", "budget")
    val up = Mix.upsampleTokens(corpus, "source", "doc_id", "n_tok", budgets)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Long)].collect()
    val books = up.filter(_._2 == "books")
    assert(books.length === 24)
    assert(books.count(_._3 == 0L) === 10 && books.count(_._3 == 1L) === 10)
    assert(books.filter(_._3 == 2L).map(_._1).sorted.toSeq ===
      Seq(1000L, 1001L, 1002L, 1003L))
    val web = up.filter(_._2 == "web")
    assert(web.map(_._1).sorted.toSeq === (0L until 5L))
    assert(web.forall(_._3 == 0L))
  }

  test("upsampleTokens epoch count is exact integer ceil past 2^53") {
    // budget = 3*2^52 + 1 over supply 2^52: double division reads exactly
    // 3.0 (the +1 is below the ulp at 3), so double ceil loses the 4th
    // epoch the audit's DIV ceil promises — and the admission predicate
    // (exact long arithmetic) confirms epoch 3 starts under budget
    val big = 1L << 52
    val one = Seq((1L, "s", big)).toDF("doc_id", "source", "n_tok")
    val budgets = Seq(("s", 3L * big + 1L)).toDF("source", "budget")
    val epochs = Mix.upsampleTokens(one, "source", "doc_id", "n_tok", budgets)
      .select("epoch").as[Long].collect().sorted.toSeq
    assert(epochs === Seq(0L, 1L, 2L, 3L),
      s"double-ceil epoch count disagrees with the audit: $epochs")
  }

  test("upsampleTokens: fitting budgets reduce to capTokens; absent strata kept once") {
    val budgets = Seq(("web", 1050L)).toDF("source", "budget")
    val up = Mix.upsampleTokens(corpus, "source", "doc_id", "n_tok", budgets)
      .select("doc_id", "source", "epoch").as[(Long, String, Long)].collect()
    assert(up.forall(_._3 == 0L), "no stratum needed a second epoch")
    val cap = Mix.capTokens(corpus, "source", "doc_id", "n_tok", budgets)
      .select("doc_id").as[Long].collect().toSet
    assert(up.map(_._1).toSet === cap, "epoch-0 admission == capTokens")
    assert(up.count(_._2 == "books") === 10, "absent stratum kept in full")
  }

  test("upsampleTokens clamps runaway epoch counts (the UniMax cap)") {
    // a quota absurdly above supply must not materialize millions of
    // epochs — it clamps at maxEpochs whole passes
    val budgets = Seq(("books", 1000000000L)).toDF("source", "budget")
    val up = Mix.upsampleTokens(corpus, "source", "doc_id", "n_tok", budgets,
        maxEpochs = 5L)
      .where($"source" === "books")
      .select("doc_id", "epoch").as[(Long, Long)].collect()
    assert(up.length === 50, "5 clamped epochs x 10 docs")
    assert(up.map(_._2).max === 4L)
  }

  test("audit: epochs, delivered and unique/repeated split check out by hand") {
    // supplies: web 5000, books 3000; alpha=1 natural; budget 16000 total
    val a = Mix.audit(corpus, "source", "n_tok", alpha = 1.0,
        totalBudget = 16000L)
      .orderBy("source").collect()
    val books = a(0); val web = a(1)
    // natural p: web 5/8, books 3/8 → budgets 10000, 6000
    assert(web.getAs[Long]("budget") === 10000L)
    assert(books.getAs[Long]("budget") === 6000L)
    // web: budget 10000 > supply 5000 → 2 epochs, unique 5000, repeated 5000
    assert(web.getAs[Long]("epochs") === 2L)
    assert(web.getAs[Long]("delivered_tokens") === 10000L)
    assert(web.getAs[Long]("unique_tokens") === 5000L)
    assert(web.getAs[Long]("repeated_tokens") === 5000L)
    assert(web.getAs[Double]("unique_frac") === 0.5)
    // books: budget 6000 = 2x supply 3000
    assert(books.getAs[Long]("epochs") === 2L)
    assert(books.getAs[Long]("repeated_tokens") === 3000L)
  }

  test("audit: the UniMax clamp bounds delivered tokens, not the budget") {
    val tiny = Seq((1L, "rare", 10L), (2L, "big", 100000L))
      .toDF("doc_id", "source", "n_tok")
    val a = Mix.audit(tiny, "source", "n_tok", alpha = 0.3,
        totalBudget = 10000000L, maxEpochs = 5L)
      .where(col("source") === "rare").collect().head
    assert(a.getAs[Long]("epochs") === 5L)
    assert(a.getAs[Long]("delivered_tokens") === 50L) // 5 epochs x 10 tokens
    assert(a.getAs[Long]("unique_tokens") === 10L)
  }

  test("upsampleTokens: zero budget admits nothing") {
    val budgets = Seq(("books", 0L)).toDF("source", "budget")
    val up = Mix.upsampleTokens(corpus, "source", "doc_id", "n_tok", budgets)
      .select("source").as[String].collect()
    assert(!up.contains("books"))
    assert(up.count(_ == "web") === 50)
  }

  test("sliced running sum agrees with the single-window formulation") {
    val budgets = Seq(("web", 1050L), ("books", 600L)).toDF("source", "budget")
    for (sub <- Seq(1, 8)) {
      val got = Mix.capTokens(corpus, "source", "doc_id", "n_tok", budgets,
          subStrata = sub)
        .select("doc_id").as[Long].collect().toSet
      val w = Window.partitionBy("source").orderBy(col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ref = corpus.withColumn("cum", sum("n_tok").over(w))
        .join(budgets, Seq("source"))
        .where(col("cum") - col("n_tok") < col("budget"))
        .select("doc_id").as[Long].collect().toSet
      assert(got === ref, s"subStrata=$sub")
    }
  }

  test("excessLossBudgets: hand-computed excess, exp tilt, clip, smoothing") {
    // losses 6dp-quantized per the contract; 'hard' domain excess = mean of
    // max(0, loss - ref) = (0.2 + 0.4)/2 = 0.3; 'easy' clips to 0
    val perDoc = Seq(
      ("hard", 1.500000, 1.300000), ("hard", 1.800000, 1.400000),
      ("easy", 0.900000, 1.000000), ("easy", 1.000000, 1.000000))
      .toDF("dom", "loss", "ref_loss")
    val out = Mix.excessLossBudgets(perDoc, "dom", "loss", "ref_loss",
      eta = 2.0, totalBudget = 1000L)
      .orderBy("dom").as[(String, Long, Double, Double, Long)].collect()
    assert(out.map(_._1).toSeq === Seq("easy", "hard"))
    assert(out.map(_._2).toSeq === Seq(2L, 2L))
    assert(out(0)._3 === 0.0)
    assert(math.abs(out(1)._3 - 0.3) < 1e-9)
    // tilt: exp(0)=1 vs exp(0.6), each micro-quantized before the exact
    // normalizer sum (temperatureBudgets' convention) — the expectation
    // mirrors the quantization, so the assertion is exact-tolerance
    val tHard = math.rint(math.exp(0.6) * 1e6)
    val pHard = tHard / (1e6 + tHard)
    assert(math.abs(out(1)._4 - pHard) < 1e-12)
    assert(out(1)._5 === math.floor(pHard * 1000).toLong)
    assert(math.abs(out(0)._4 + out(1)._4 - 1.0) < 1e-12)
    // full smoothing collapses to uniform regardless of excess
    val uni = Mix.excessLossBudgets(perDoc, "dom", "loss", "ref_loss",
      eta = 2.0, totalBudget = 1000L, smoothing = 1.0)
      .select("p").as[Double].collect()
    uni.foreach(p => assert(math.abs(p - 0.5) < 1e-12))
  }

  test("excessLossBudgets: weight order tracks excess order") {
    val perDoc = Seq(("a", 2.0, 1.0), ("b", 1.5, 1.0), ("c", 1.0, 1.0))
      .toDF("dom", "loss", "ref_loss")
    val out = Mix.excessLossBudgets(perDoc, "dom", "loss", "ref_loss",
      eta = 1.0, totalBudget = 10000L)
      .orderBy(desc("mean_excess")).as[(String, Long, Double, Double, Long)]
      .collect()
    assert(out.map(_._1).toSeq === Seq("a", "b", "c"))
    assert(out.map(_._4).toSeq === out.map(_._4).toSeq.sorted.reverse)
    assert(out.map(_._5).toSeq === out.map(_._5).toSeq.sorted.reverse)
  }

  test("schedule: integer interpolation between two allocations") {
    val start = Seq(("web", 800L), ("books", 200L)).toDF("source", "budget")
    val end = Seq(("web", 200L), ("books", 800L)).toDF("source", "budget")
    val out = Mix.schedule(start, end, "source", nPhases = 4)
      .orderBy("source", "phase")
      .as[(String, Long, Long)].collect().toSeq
    // per-phase = lerp(s, e, i/3) / 4, integer floor:
    // web: (800*3+200*0)/12=200, (800*2+200)/12=150, (800+400)/12=100, 600/12=50
    assert(out === Seq(
      ("books", 0L, 50L), ("books", 1L, 100L), ("books", 2L, 150L), ("books", 3L, 200L),
      ("web", 0L, 200L), ("web", 1L, 150L), ("web", 2L, 100L), ("web", 3L, 50L)))
    // each phase totals ~1/K of the run; whole schedule ~ the mean mix
    assert(out.map(_._3).sum === 1000L - 0L) // floors land exactly here
  }

  test("schedule: strata missing on one side interpolate from zero") {
    val start = Seq(("web", 600L)).toDF("source", "budget")
    val end = Seq(("code", 600L)).toDF("source", "budget")
    val out = Mix.schedule(start, end, "source", nPhases = 3)
      .orderBy("source", "phase").as[(String, Long, Long)].collect().toSeq
    // lerp(s, e, i/2) / 3: web 600*(2-i)/6, code 600*i/6; the schedule
    // totals avg(start, end) = 300 per stratum
    assert(out === Seq(
      ("code", 0L, 0L), ("code", 1L, 100L), ("code", 2L, 200L),
      ("web", 0L, 200L), ("web", 1L, 100L), ("web", 2L, 0L)))
  }

  test("schedule rejects strata columns named after its output columns") {
    // a strataCol called "phase" would be overwritten by the phase index,
    // one called "budget" shadowed by the interpolated quota — loud failure
    val a = Seq(("x", 10L)).toDF("phase", "budget")
    for (bad <- Seq("phase", "budget")) {
      val e = intercept[IllegalArgumentException] {
        Mix.schedule(a, a, bad, nPhases = 2)
      }
      assert(e.getMessage.contains("'phase' or 'budget'"))
    }
  }
}
