package graft.quality

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable model-based quality filter — the classifier step of the
  * GPT-3/CCNet curation recipe (score every crawl document by "does it
  * look like the high-quality reference corpus", keep by threshold or
  * importance-sample), complementing the heuristic scores
  * (`graft_quality`) and DSIR weighting ([[graft.operators.Importance]]).
  * Logistic regression over hashed word n-gram features (unigrams +
  * bigrams md5-bucketed, per-document tf-normalized) — fastText-shaped,
  * no external dependencies.
  *
  * Scale shape: SCORING is the 100 TB path and is pure DataFrame — the
  * corpus explodes once to (doc, bucket, count) rows (document text never
  * shuffles), the weight table is `nBuckets` rows and broadcasts, one
  * compact-key shuffle aggregates per-doc dots (exactly [[graft.operators.
  * Importance.weights]]'s shape). TRAINING runs on the labeled corpus
  * (orders of magnitude smaller — labels are the scarce resource): the
  * featurized set is cached once, then each of `iters` driver-coordinated
  * rounds broadcasts the (nBuckets+1)-double weight vector and reduces one
  * ~32 KB partial-gradient array per partition — the standard distributed
  * batch-GD shape (MLlib's treeAggregate pattern); per-partition imperative
  * accumulation is exactly the narrow case the RDD escape hatch is for.
  */
object QualityClassifier {

  /** Trained weights; `weights(b)` is bucket b's coefficient. */
  final case class Model(weights: Array[Double], bias: Double, nBuckets: Int)

  private def gramsOf(c: Column): Column =
    concat(shinglesAllFast(c, 1), shinglesAllFast(c, 2))
  private def bucketOf(g: Column, nBuckets: Int): Column =
    conv(substring(md5(concat(g, lit(":qc"))), 1, 4), 16, 10)
      .cast("long") % nBuckets

  /** Per-document normalized bucket tf: `(doc_id, b, x)` with
    * `sum(x) = 1` per doc. Docs with zero grams produce no rows (and thus
    * no score — same contract as [[graft.operators.Importance.weights]]).
    */
  private def features(df: DataFrame, idCol: String, textCol: String,
                       nBuckets: Int): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("doc_id"), explode(gramsOf(col(textCol))).as("g"))
      .select(col("doc_id"), bucketOf(col("g"), nBuckets).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n_db"))
    val tot = perDoc.groupBy("doc_id").agg(sum("n_db").as("n_tot"))
    perDoc.join(tot, "doc_id")
      .select(col("doc_id"), col("b").cast("int").as("b"),
        (col("n_db").cast("double") / col("n_tot")).as("x"))
  }

  /** Full-batch logistic regression on `labeled` (`labelCol` in {0, 1})
    * with Adagrad per-coordinate steps: the bias "feature" is 1.0 while
    * tf-normalized word features are ~1/docLen, so any single global
    * learning rate either stalls the words or makes the bias oscillate —
    * per-coordinate step normalization (`lr / sqrt(Σ g²)`) is the standard
    * fix for sparse text features. Deterministic up to float summation
    * order: zero init, full-batch rounds, no sampling.
    *
    * Early stop: the same distributed pass that produces the gradient also
    * folds the full-batch log-loss (one extra accumulator slot — no extra
    * job), and training stops once a round improves it by less than `tol`
    * relative (after `minIters` rounds). `iters` remains the hard ceiling.
    * q89 measured 50 fixed rounds paying ~20 rounds of no-op tail; the
    * stop criterion reads the loss that is already computed, so each round
    * costs exactly what it did before.
    *
    * Determinism caveat: the log-loss is folded by a float `reduce` whose
    * partial-sum order Spark does not fix, so the raw loss carries ulp-level
    * run-to-run jitter. The convergence test therefore compares losses
    * ROUNDED to 1e-9 — comfortably above float-reduce jitter for corpus-size
    * sums, far below any meaningful `tol` — so the stopping round (and hence
    * the trained weights) cannot flip between runs on a sub-jitter delta.
    * The weights themselves remain deterministic only up to the gradient's
    * own summation-order ulps, as before.
    */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String, nBuckets: Int = 4096, iters: Int = 50,
            lr: Double = 0.5, l2: Double = 1e-6,
            tol: Double = 1e-3, minIters: Int = 10): Model = {
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets must be in (0, 65536] (16-bit md5 prefix), got $nBuckets")
    val spark = labeled.sparkSession
    import spark.implicits._
    val f = features(labeled, idCol, textCol, nBuckets)
      .join(labeled.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("y")), "doc_id")
      .groupBy("doc_id").agg(first("y").as("y"),
        collect_list("b").as("bs"), collect_list("x").as("xs"))
      .select(col("y"), col("bs"), col("xs"))
      .as[(Double, Seq[Int], Seq[Double])]
      .cache()
    val n = f.count().toDouble
    require(n > 0, "no featurizable labeled documents")
    var w = new Array[Double](nBuckets + 1) // last slot = bias
    val gSq = new Array[Double](nBuckets + 1) // Adagrad accumulator
    var prevLoss = Double.MaxValue
    var rounds = 0
    var converged = false
    while (rounds < iters && !converged) {
      val bc = spark.sparkContext.broadcast(w)
      val grad = f.mapPartitions { it =>
        val wv = bc.value
        // gradient in slots [0, wv.length); full-batch log-loss in the
        // extra last slot — same pass, no separate evaluation job
        val g = new Array[Double](wv.length + 1)
        it.foreach { case (y, bs, xs) =>
          var dot = wv(wv.length - 1)
          var i = 0
          while (i < bs.length) { dot += wv(bs(i)) * xs(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-dot))
          val err = p - y
          i = 0
          while (i < bs.length) { g(bs(i)) += err * xs(i); i += 1 }
          g(wv.length - 1) += err
          g(wv.length) -= y * math.log(p + 1e-12) +
            (1.0 - y) * math.log(1.0 - p + 1e-12)
        }
        Iterator.single(g)
      }.reduce { (a, b) =>
        var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
      }
      // fixed-point fold of the nondeterministically ordered float reduce:
      // 1e-9 rounding makes the convergence-delta test stable across runs
      val loss = math.rint(grad(w.length) / n * 1e9) / 1e9
      val next = new Array[Double](w.length)
      var i = 0
      while (i < w.length) {
        val reg = if (i == w.length - 1) 0.0 else l2 * w(i)
        val g = grad(i) / n + reg
        gSq(i) += g * g
        next(i) = w(i) - lr * g / (math.sqrt(gSq(i)) + 1e-8)
        i += 1
      }
      bc.destroy()
      w = next
      rounds += 1
      if (rounds >= minIters &&
          prevLoss - loss < tol * math.max(prevLoss, 1e-12)) converged = true
      prevLoss = loss
    }
    System.err.println(
      s"[quality-classifier] stopped after $rounds/$iters rounds " +
      f"(log-loss $prevLoss%.6f, ${if (converged) "converged" else "iteration cap"})")
    f.unpersist()
    Model(w.take(nBuckets), w(nBuckets), nBuckets)
  }

  /** Score documents with a trained model: `(<id>, score)` in (0, 1),
    * higher = more positive-class-like. Pure DataFrame — this is the path
    * that runs over the full corpus.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wt = model.weights.zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq.toDF("b", "w")
    features(df, idCol, textCol, model.nBuckets)
      .join(broadcast(wt), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("x") * col("w")).as("dot"))
      .select(col("doc_id").as(idCol),
        (lit(1.0) / (lit(1.0) + exp(-(col("dot") + lit(model.bias)))))
          .as("score"))
  }
}
