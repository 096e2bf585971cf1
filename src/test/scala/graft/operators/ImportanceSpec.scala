package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma alpha", "t"),
    (2L, "alpha beta", "t"),
    (3L, "delta epsilon zeta delta epsilon", "r"),
    (4L, "beta delta common words here", "r"),
    (5L, "alpha beta gamma words", "r"),
    (6L, "   ", "r") // whitespace-only: no tokens, must be absent
  )

  private def docs = corpus.toDF("doc_id", "text", "grp")

  /** Independent scalar reference of the same DSIR weighting. */
  private def reference(corpus: Seq[(Long, String, String)],
                        buckets: Int = 4096, alpha: Double = 1.0): Map[Long, Double] = {
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(t: String) = { val ts = toks(t); ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((g + ":imp").getBytes("UTF-8"))
      val hex = md.take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val all = corpus.filter(c => toks(c._2).nonEmpty)
    val rawB = all.flatMap(c => grams(c._2).map(bucket))
    val tgtB = all.filter(_._3 == "t").flatMap(c => grams(c._2).map(bucket))
    val rCnt = rawB.groupBy(identity).view.mapValues(_.size).toMap
    val tCnt = tgtB.groupBy(identity).view.mapValues(_.size).toMap
    val (rTot, tTot) = (rawB.size, tgtB.size)
    def lr(b: Long) = r6(math.log(
      ((tCnt.getOrElse(b, 0) + alpha) / (tTot + alpha * buckets)) /
      ((rCnt.getOrElse(b, 0) + alpha) / (rTot + alpha * buckets))))
    all.map { c =>
      val perB = grams(c._2).map(bucket).groupBy(identity).view.mapValues(_.size)
      val contribs = perB.map { case (b, n) =>
        BigDecimal(java.lang.Double.toString(r6(n * lr(b)))) }.toSeq
      c._1 -> contribs.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("weights match an independent scalar DSIR computation exactly") {
    val got = Importance.weights(docs, docs.where(col("grp") === "t"),
        "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    val want = reference(corpus)
    assert(got.keySet == want.keySet, "whitespace-only doc excluded")
    for ((id, w) <- want) assert(got(id) == w, s"weight for doc $id")
  }

  test("property: weights match the scalar reference on random corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- Seq(5, 17, 31)) {
      val rnd = new scala.util.Random(seed)
      val c = (1L to 25L).map { id =>
        val grp = if (rnd.nextDouble() < 0.3) "t" else "r"
        (id, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "), grp)
      }
      // ensure a non-empty target stratum
      val withT = if (c.exists(_._3 == "t")) c
        else c.updated(0, (c.head._1, c.head._2, "t"))
      val df = withT.toDF("doc_id", "text", "grp")
      val got = Importance.weights(df, df.where(col("grp") === "t"),
          "doc_id", "text")
        .as[(Long, Double)].collect().toMap
      val want = reference(withT)
      assert(got == want, s"seed $seed")
    }
  }

  test("target-looking documents score higher than off-domain ones") {
    val got = Importance.weights(docs, docs.where(col("grp") === "t"),
        "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    // doc 5 shares 'alpha beta gamma' with the target; doc 3 shares nothing
    assert(got(5L) > got(3L))
    assert(got(1L) > got(3L), "target doc itself scores high")
  }

  test("an empty target yields finite uniform-model weights, not nulls") {
    // sum over an empty frame is null; un-coalesced totals would
    // null-poison every document's weight and downstream keep/drop
    // selections would decide on null semantics instead of failing
    val got = Importance.weights(docs, docs.where(col("grp") === "nope"),
        "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(got.nonEmpty && got.values.forall(w => !w.isNaN && !w.isInfinite),
      s"empty target must read as the uniform model: $got")
  }

  test("bucket tables broadcast; only (doc,bucket) rows shuffle") {
    val plan = Importance.weights(docs, docs.where(col("grp") === "t"),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }
}
