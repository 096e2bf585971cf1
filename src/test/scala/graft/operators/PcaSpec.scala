package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // data = a*u + b*w in 8-dim, with var(a) >> var(b): PC1 must recover u
  private val u = Array(0.6, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
  private val w = Array(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)
  private def mk(i: Int): (Long, Array[Float]) = {
    // deterministic "noise-free" coefficients with known variances
    val a = 3.0 * math.sin(i * 1.7)     // var ~ 4.5
    val b = 0.7 * math.cos(i * 2.3)     // var ~ 0.245
    (i.toLong, Array.tabulate(8)(d => (a * u(d) + b * w(d) + 0.05).toFloat))
  }
  private val corpus = (0 until 200).map(mk).toDF("vec_id", "embedding")

  test("vectors wider than MaxDim are rejected loudly, not ground through") {
    val wide = Seq((1L, Array.fill(Pca.MaxDim + 1)(0.5f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] { Pca.fit(wide, "embedding", k = 2) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("MaxDim")),
      s"expected the MaxDim guard, got: ${ex.getMessage}")
  }

  test("ragged vector columns fail loudly, never contribute partial moments") {
    val ragged = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] { Pca.fit(ragged.coalesce(1), "embedding", k = 1) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("ragged")),
      s"expected the ragged guard, got: ${ex.getMessage}")
    // ragged across partitions surfaces in the reduce
    val ex2 = intercept[Exception] { Pca.fit(ragged.repartition(2, col("vec_id")),
      "embedding", k = 1) }
    assert(msgs(ex2).exists(m => m != null && m.contains("ragged")),
      s"expected the cross-partition ragged guard, got: ${ex2.getMessage}")
  }

  test("PC1 recovers the dominant axis; eigenvalues descend; axes are unit") {
    val m = Pca.fit(corpus, "embedding", k = 3)
    assert(m.values.length === 3 && m.vectors.length === 3)
    assert(m.values.zip(m.values.tail).forall { case (x, y) => x >= y - 1e-12 })
    m.vectors.foreach { c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9) }
    val cos1 = m.vectors(0).zip(u).map { case (x, y) => x * y }.sum
    assert(math.abs(cos1) > 0.999, s"PC1 misaligned: $cos1")
    val cos2 = m.vectors(1).zip(w).map { case (x, y) => x * y }.sum
    assert(math.abs(cos2) > 0.999, s"PC2 misaligned: $cos2")
    // sign convention + fixed sweep order make the fit reproducible for
    // well-separated eigenvalues (the rank-2 data's near-zero pairs span a
    // degenerate subspace where any basis is a valid answer — skip those)
    val m2 = Pca.fit(corpus, "embedding", k = 3)
    m.vectors.take(2).zip(m2.vectors.take(2)).foreach { case (c1, c2) =>
      c1.zip(c2).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) } }
  }

  test("projection variance matches the eigenvalues; whitening equalizes it") {
    val m = Pca.fit(corpus, "embedding", k = 2)
    def vars(df: org.apache.spark.sql.DataFrame): Array[Double] =
      (0 until 2).map { j =>
        df.select(element_at(col("proj"), j + 1).as("p"))
          .agg(var_pop(col("p"))).collect()(0).getDouble(0)
      }.toArray
    val raw = vars(Pca.project(corpus, "vec_id", "embedding", m))
    raw.zip(m.values).foreach { case (s2, ev) =>
      assert(math.abs(s2 - ev) < 1e-6 * math.max(1.0, ev), s"$s2 vs $ev") }
    val white = vars(Pca.project(corpus, "vec_id", "embedding", m, whiten = true))
    white.foreach(s2 => assert(math.abs(s2 - 1.0) < 1e-3, s"whitened var $s2"))
  }

  test("uncentered full-rank fit is a rotation: dot products exact; balancedForPq equalizes subspace energy") {
    val m0 = Pca.fit(corpus, "embedding", k = 8, center = false)
    assert(m0.mean.forall(_ == 0.0))
    val full = corpus.where(col("vec_id") < 8)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val rot = Pca.project(corpus.where(col("vec_id") < 8), "vec_id", "embedding", m0)
      .as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- 0L until 8L; j <- i until 8L)
      assert(math.abs(dot(full(i), full(j)) - dot(rot(i), rot(j))) < 1e-6,
        s"pair ($i,$j)")
    // snake deal into 4 groups of 2: groups {0,7},{1,6},{2,5},{3,4} — the
    // top axes spread across DIFFERENT subspaces instead of eigen order's
    // [v0 v1 | v2 v3 | ...] which dumps all energy into subspace 0
    val bal = Pca.balancedForPq(m0, mSub = 4)
    val expect = Seq(0, 7, 1, 6, 2, 5, 3, 4)
    assert(bal.values.toSeq === expect.map(m0.values),
      s"${bal.values.toSeq} vs expected deal of ${m0.values.toSeq}")
    assert(bal.vectors.toSeq.map(_.toSeq) ===
      expect.map(i => m0.vectors(i).toSeq))
    // the top subspace's energy strictly drops vs plain eigen order
    val gE = bal.values.grouped(2).map(_.sum).toArray
    val g0 = m0.values.grouped(2).map(_.sum).toArray
    assert(gE.max < g0.max, s"balanced ${gE.toSeq} vs plain ${g0.toSeq}")
  }

  test("write/open round-trips the model; projections identical") {
    val m = Pca.balancedForPq(
      Pca.fit(corpus, "embedding", k = 8, center = false), mSub = 4)
    val dir = java.nio.file.Files.createTempDirectory("pcamodel").toString
    Pca.write(m, dir, spark)
    val re = Pca.open(spark, dir)
    assert(re.mean.toSeq === m.mean.toSeq)
    assert(re.values.toSeq === m.values.toSeq)
    assert(re.vectors.toSeq.map(_.toSeq) === m.vectors.toSeq.map(_.toSeq))
    val a = Pca.project(corpus, "vec_id", "embedding", m)
      .orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq
    val b = Pca.project(corpus, "vec_id", "embedding", re)
      .orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq
    assert(a === b)
  }

  test("pairwise L2 distances survive a full-energy projection") {
    val m = Pca.fit(corpus, "embedding", k = 2) // data IS rank 2 (+mean)
    val full = corpus.where(col("vec_id") < 10)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val proj = Pca.project(corpus.where(col("vec_id") < 10), "vec_id", "embedding", m)
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- 0L until 10L; j <- (i + 1) until 10L) {
      val dFull = d2(full(i), full(j))
      val dProj = d2(proj(i), proj(j))
      assert(math.abs(dFull - dProj) < 1e-4 * math.max(1.0, dFull),
        s"pair ($i,$j): full $dFull vs projected $dProj")
    }
  }
}
