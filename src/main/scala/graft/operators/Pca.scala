package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA / whitening over an embedding column — the dimensionality-reduction
  * and decorrelation step in front of ANN indexing (PCA-reduced IVF and
  * OPQ-style rotations are standard practice for billion-scale stores:
  * smaller vectors shrink the index and speed every distance computation;
  * whitening equalizes per-dimension variance so quantizers spend their
  * budget evenly).
  *
  * Scale shape: `fit` is ONE distributed pass — each partition accumulates
  * `(n, Σv, Σvvᵀ)` (for d=64 that is a 33 KB partial, d²+d+1 doubles) and
  * the partials reduce associatively; the d×d covariance eigenproblem is
  * solved on the DRIVER with a deterministic cyclic Jacobi sweep (d ≤ a
  * few hundred makes this microseconds — the classic "big data, small
  * model" split, same shape as [[Lloyd]]). `project` is a narrow map:
  * k native `graft_dot`s against broadcast-literal component vectors,
  * using (v−μ)·c = v·c − μ·c so the mean subtraction folds into a
  * precomputed constant per component.
  */
object Pca {

  /** `vectors(j)` is the j-th unit principal axis (descending eigenvalue
    * order, ties by index; sign fixed so each axis's largest-|coordinate|
    * entry is positive — determinism across runs).
    */
  final case class Model(mean: Array[Double], values: Array[Double],
                         vectors: Array[Array[Double]])

  /** Dimension ceiling for [[fit]]: each partition's partial is d²+d+1
    * doubles, every one of which transits the reduce — 8 MB at d=1024 is
    * the sane edge of that design; d=4096 would ship 134 MB per partition
    * and the driver-side O(d³) Jacobi would dominate regardless. Above
    * this, the one-pass moment-matrix formulation is the wrong algorithm
    * (randomized/iterative SVD territory), so fail loudly instead of
    * grinding.
    */
  val MaxDim = 1024

  /** One pass over the corpus → top-k principal axes of the covariance
    * (`center = true`) or of the raw second-moment matrix
    * (`center = false`). The uncentered variant is a pure ROTATION: a
    * full-rank orthonormal basis that preserves dot products — and
    * therefore cosine — exactly, which is what [[balancedForPq]]'s
    * OPQ-style preprocessing needs (centering would shift vectors and
    * change their cosines). Vectors wider than [[MaxDim]] are rejected.
    */
  def fit(df: DataFrame, vec: String, k: Int, center: Boolean = true): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(transform(col(vec), _.cast("double")).as("v"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        var n = 0L
        var s: Array[Double] = null
        var g: Array[Double] = null // row-major d*d
        it.foreach { row =>
          val x = row.toArray
          val d = x.length
          if (s == null) {
            require(d <= MaxDim,
              s"Pca.fit: vector dimension $d exceeds MaxDim=$MaxDim — the " +
              "d^2 moment-matrix partials and the driver-side Jacobi solve " +
              "do not scale past that; reduce dimensionality first or use a " +
              "randomized/iterative SVD")
            s = new Array[Double](d); g = new Array[Double](d * d)
          }
          // a SHORTER vector would silently contribute partial moments (a
          // longer one at least crashes on the array bound) — ragged
          // embedding columns are data corruption, fail with the geometry
          require(d == s.length,
            s"Pca.fit: ragged vector column — saw dimensions ${s.length} and $d")
          var i = 0
          while (i < d) {
            s(i) += x(i)
            var j = 0
            val base = i * d
            while (j < d) { g(base + j) += x(i) * x(j); j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator.single((n, s, g))
      }
      .reduce { (a, b) =>
        // partitions are internally consistent (checked above); raggedness
        // ACROSS partitions surfaces here
        require(a._2.length == b._2.length,
          s"Pca.fit: ragged vector column — saw dimensions ${a._2.length} " +
          s"and ${b._2.length} in different partitions")
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        i = 0
        while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
        (a._1 + b._1, a._2, a._3)
      }
    val (n, s, g) = parts
    val d = s.length
    require(k > 0 && k <= d, s"k must be in [1, $d]: $k")
    val mean = if (center) s.map(_ / n) else new Array[Double](d)
    val cov = Array.tabulate(d, d)((i, j) => g(i * d + j) / n - mean(i) * mean(j))
    val (values, vectors) = jacobiEigen(cov)
    Model(mean, values.take(k), vectors.take(k))
  }

  /** Re-order a full-rank model's axes so that [[graft.operators.Pq]]'s
    * contiguous m-dim subspaces each receive comparable energy — the cheap
    * approximation of OPQ (Ge et al. 2013): plain PCA order would dump
    * nearly all variance into the FIRST subspace, starving the others'
    * codebooks; dealing the variance-sorted axes snake-wise into `mSub`
    * groups balances them. Use with `fit(center = false)` so the rotation
    * preserves cosine, then encode the projected vectors.
    */
  def balancedForPq(m: Model, mSub: Int): Model = {
    require(m.vectors.length % mSub == 0,
      s"k=${m.vectors.length} must divide into $mSub subspaces")
    val groups = Array.fill(mSub)(scala.collection.mutable.ArrayBuffer.empty[Int])
    m.values.indices.foreach { i =>
      val round = i / mSub
      val j = if (round % 2 == 0) i % mSub else mSub - 1 - (i % mSub)
      groups(j) += i
    }
    val order = groups.flatMap(_.toArray)
    Model(m.mean, order.map(m.values), order.map(m.vectors))
  }

  /** `(<id>, proj)` — k-dim projection (optionally whitened by
    * 1/sqrt(eigenvalue)); a narrow map over the corpus.
    */
  def project(df: DataFrame, id: String, vec: String, model: Model,
              whiten: Boolean = false, eps: Double = 1e-9): DataFrame = {
    val dims = model.vectors.indices.map { j =>
      val c = model.vectors(j)
      val mu = model.mean.zip(c).map { case (m, ci) => m * ci }.sum
      val scale = if (whiten) 1.0 / math.sqrt(model.values(j) + eps) else 1.0
      (dotFast(col(vec), typedLit(c.toSeq)) - lit(mu)) * lit(scale)
    }
    df.select(col(id), array(dims: _*).as("proj"))
  }

  /** Persist a model (one parquet row per axis, in order, plus the mean
    * as axis −1) so a rotation/projection trained once can be reopened by
    * every later job — e.g. stored NEXT TO a persisted [[IvfPq]] store
    * whose vectors were encoded in the rotated basis (reopening the index
    * without the rotation would make new queries unencodable). Composes
    * with [[graft.pipeline.IndexVersions]] like any other index artifact.
    */
  def write(model: Model, path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val rows = (-1, 0.0, model.mean.toSeq) +:
      model.values.indices.map(j => (j, model.values(j), model.vectors(j).toSeq))
    rows.toSeq.toDF("axis", "value", "vec")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Reopen a persisted model. */
  def open(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    val (meanRow, axes) = (rows.head, rows.tail)
    require(meanRow._1 == -1, s"malformed PCA model at $path")
    Model(meanRow._3, axes.map(_._2), axes.map(_._3))
  }

  /** Cyclic Jacobi on a symmetric matrix: all eigenpairs, descending
    * value. Deterministic: fixed sweep order, convergence by off-diagonal
    * norm, sign convention on the returned axes.
    */
  private[operators] def jacobiEigen(a: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = Array.tabulate(d, d)((i, j) => a(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += m(i)(j) * m(i)(j)
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(m(p)(q)) > 1e-300) {
        val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var i = 0
        while (i < d) {
          val mip = m(i)(p); val miq = m(i)(q)
          m(i)(p) = c * mip - s * miq
          m(i)(q) = s * mip + c * miq
          i += 1
        }
        i = 0
        while (i < d) {
          val mpi = m(p)(i); val mqi = m(q)(i)
          m(p)(i) = c * mpi - s * mqi
          m(q)(i) = s * mpi + c * mqi
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
          i += 1
        }
      }
      sweep += 1
    }
    val pairs = (0 until d).map { j =>
      val axis = Array.tabulate(d)(i => v(i)(j))
      // sign convention: largest-|coordinate| entry positive
      val am = axis.indices.maxBy(i => (math.abs(axis(i)), -i))
      (m(j)(j), if (axis(am) < 0) axis.map(-_) else axis)
    }.sortBy { case (value, _) => -value }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }
}
