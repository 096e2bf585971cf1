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
  * (orders of magnitude smaller — labels are the scarce resource):
  * featurization is one distributed pass, then the iteration loop is
  * hybrid-routed ([[train]] scaladoc) — driver-local when the featurized
  * rows fit a fixed budget (the common case; zero Spark jobs per round),
  * otherwise each of `iters` driver-coordinated rounds broadcasts the
  * (nBuckets+1)-double weight vector and reduces one ~32 KB
  * partial-gradient array per partition — the standard distributed
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

  /** Per-document raw bucket counts: `(doc_id, b, n)`. Consumers divide by
    * the per-doc total `Σ n` where they already aggregate per doc, so the
    * tf normalization costs NO corpus-sized self-join (the previous shape
    * joined a per-doc-total frame back onto the feature rows — an extra
    * groupBy plus a repartitioning join on the 100 TB scoring path). Docs
    * with zero grams produce no rows (and thus no score — same contract as
    * [[graft.operators.Importance.weights]]).
    */
  private def features(df: DataFrame, idCol: String, textCol: String,
                       nBuckets: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(gramsOf(col(textCol))).as("g"))
      .select(col("doc_id"), bucketOf(col("g"), nBuckets).cast("int").as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))

  /** Per-doc gradient + log-loss accumulation shared verbatim by the local
    * and distributed training routes: gradient in `g(0, wv.length)`,
    * full-batch log-loss folded into the extra last slot `g(wv.length)` —
    * the loss rides the gradient pass, no separate evaluation job.
    */
  private def accumulate(g: Array[Double], wv: Array[Double],
                         y: Double, bs: Array[Int], xs: Array[Double]): Unit = {
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

  /** One Adagrad round from a summed gradient array: returns the updated
    * weights and the 1e-9-rounded full-batch loss (see determinism caveat
    * on [[train]] — the rounding makes the convergence-delta test stable
    * against float-reduce summation-order jitter).
    */
  private def step(w: Array[Double], gSq: Array[Double], grad: Array[Double],
                   n: Double, lr: Double, l2: Double): (Array[Double], Double) = {
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
    (next, loss)
  }

  /** Full-batch logistic regression on `labeled` (`labelCol` in {0, 1})
    * with Adagrad per-coordinate steps: the bias "feature" is 1.0 while
    * tf-normalized word features are ~1/docLen, so any single global
    * learning rate either stalls the words or makes the bias oscillate —
    * per-coordinate step normalization (`lr / sqrt(Σ g²)`) is the standard
    * fix for sparse text features. Deterministic up to float summation
    * order: zero init, full-batch rounds, no sampling.
    *
    * Early stop: the same pass that produces the gradient also folds the
    * full-batch log-loss (one extra accumulator slot — no extra job), and
    * training stops once a round improves it by less than `tol` relative
    * (after `minIters` rounds). `iters` remains the hard ceiling. q89
    * measured 50 fixed rounds paying ~20 rounds of no-op tail; the stop
    * criterion reads the loss that is already computed, so each round
    * costs exactly what it did before.
    *
    * Hybrid route (the [[graft.operators.Bpe]] `localVocabLimit` shape):
    * featurization is always distributed — the gram explode over document
    * text is the heavy part — but the iteration loop runs on whichever
    * side the FEATURE ROWS fit. Labels are the scarce resource, so the
    * featurized labeled set is usually tiny next to the corpus: when its
    * total (bucket, x) row count is ≤ `localFeatureLimit` (default 2²²
    * rows ≈ 64 MB of primitive arrays) it is collected ONCE and the
    * identical Adagrad loop runs on the driver — `iters` rounds cost zero
    * Spark jobs instead of `iters` broadcast+aggregate jobs. Past the
    * limit, the distributed treeAggregate-shape loop runs as before; a
    * 10⁸-row labeled set never lands on the driver. Both routes share
    * [[accumulate]]/[[step]] verbatim, so they differ only in float
    * summation order (driver sums in doc order; the distributed reduce's
    * partial-sum order Spark does not fix — that jitter existed before the
    * hybrid and is what the 1e-9 loss rounding absorbs).
    */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String, nBuckets: Int = 4096, iters: Int = 50,
            lr: Double = 0.5, l2: Double = 1e-6,
            tol: Double = 1e-3, minIters: Int = 10,
            localFeatureLimit: Long = 1L << 22): Model = {
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets must be in (0, 65536] (16-bit md5 prefix), got $nBuckets")
    val spark = labeled.sparkSession
    import spark.implicits._
    // tf normalization as per-row array math on the aggregated lists (no
    // per-doc-total join); the label join runs at doc granularity on the
    // exchange the collect_list groupBy already produced
    val nsTot = aggregate(col("ns"), lit(0L), (a, x) => a + x).cast("double")
    val f = features(labeled, idCol, textCol, nBuckets)
      .groupBy("doc_id")
      .agg(collect_list("b").as("bs"), collect_list("n").as("ns"))
      .join(labeled.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("y")), "doc_id")
      .select(col("y"), col("bs"),
        transform(col("ns"), n => n.cast("double") / nsTot).as("xs"))
      // primitive-array decode: the collected/iterated rows index bs/xs in
      // the hot loop — a boxed Seq decode makes that quadratic per doc
      .as[(Double, Array[Int], Array[Double])]
      .cache()
    val (nDocs, featRows) = f.groupBy()
      .agg(count(lit(1)), coalesce(sum(size(col("bs"))), lit(0L)))
      .as[(Long, Long)].head()
    val n = nDocs.toDouble
    require(n > 0, "no featurizable labeled documents")
    var w = new Array[Double](nBuckets + 1) // last slot = bias
    val gSq = new Array[Double](nBuckets + 1) // Adagrad accumulator
    var prevLoss = Double.MaxValue
    var rounds = 0
    var converged = false
    val local = featRows <= localFeatureLimit
    val localRows = if (local) f.collect() else null
    if (local) f.unpersist()
    while (rounds < iters && !converged) {
      val grad =
        if (local) {
          val g = new Array[Double](w.length + 1)
          val wv = w
          localRows.foreach { case (y, bs, xs) => accumulate(g, wv, y, bs, xs) }
          g
        } else {
          val bc = spark.sparkContext.broadcast(w)
          val g = f.mapPartitions { it =>
            val wv = bc.value
            val acc = new Array[Double](wv.length + 1)
            it.foreach { case (y, bs, xs) => accumulate(acc, wv, y, bs, xs) }
            Iterator.single(acc)
          }.reduce { (a, b) =>
            var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
          }
          bc.destroy()
          g
        }
      val (next, loss) = step(w, gSq, grad, n, lr, l2)
      w = next
      rounds += 1
      if (rounds >= minIters &&
          prevLoss - loss < tol * math.max(prevLoss, 1e-12)) converged = true
      prevLoss = loss
    }
    System.err.println(
      s"[quality-classifier] stopped after $rounds/$iters rounds " +
      f"(log-loss $prevLoss%.6f, ${if (converged) "converged" else "iteration cap"}, " +
      s"${if (local) s"local loop over $featRows feature rows" else "distributed loop"})")
    if (!local) f.unpersist()
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
      .agg((sum(col("n") * col("w")) / sum(col("n"))).as("dot"))
      .select(col("doc_id").as(idCol),
        (lit(1.0) / (lit(1.0) + exp(-(col("dot") + lit(model.bias)))))
          .as("score"))
  }
}
