package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` / `array<double>`.
  *
  * Pure Catalyst higher-order-function compositions (`zip_with` +
  * `aggregate`) — codegen-friendly, no UDF serialization, and the fold order
  * is left-to-right deterministic, which keeps results reproducible across
  * runs and cluster layouts. All math is done in double precision regardless
  * of the storage type.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), _ * _), lit(0.0), _ + _)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))

  /** Cosine similarity; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na > 0 && nb > 0, dot(a, b) / (na * nb))
  }

  /** Unit-normalize (precompute once, then cosine = dot — halves the work in
    * a top-k scan over a large corpus).
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n > 0, transform(d(a), _ / n))
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits of dot products with
    * deterministic pseudo-random hyperplanes (hash-derived, seedable).
    * Vectors with equal signatures are cosine-similar candidates.
    * The hyperplane component for (bit b, dim i) is a deterministic value in
    * [-1, 1) derived from xxhash64(seed, b, i) — no stored model needed, any
    * executor can recompute it, and signatures are stable across runs.
    */
  def hyperplaneLsh(vec: Column, nBits: Int, seed: Int = 42): Column = {
    val v = d(vec)
    val bits = (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * (pmod(xxhash64(lit(seed), lit(b), i), lit(2000000L)).cast("double") / 1000000.0 - 1.0)),
        lit(0.0), _ + _)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }
}
