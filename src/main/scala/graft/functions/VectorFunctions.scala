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

  // --- native fast paths (graft.expressions via GraftFunctions.register) ---
  def dotFast(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosineFast(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def normalizeFast(a: Column): Column = call_function("graft_l2norm", a)
  def hyperplaneLshFast(vec: Column, nBits: Int, seed: Int = 42): Column =
    call_function("graft_hyperplane_lsh", vec, lit(nBits), lit(seed))

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
    // Single pass: fold the (value, dim) pairs once, accumulating all nBits
    // projections in an array — avoids nBits copies of the vector subtree.
    val paired = zip_with(d(vec), sequence(lit(0), size(vec) - 1),
      (x, i) => struct(x.as("x"), i.as("i")))
    val projs = aggregate(
      paired,
      array_repeat(lit(0.0), nBits),
      (acc, e) => zip_with(acc, sequence(lit(0), lit(nBits - 1)),
        (a, b) => a + e.getField("x") *
          (pmod(xxhash64(lit(seed), b, e.getField("i")), lit(2000000L)).cast("double") / 1000000.0 - 1.0)))
    aggregate(
      zip_with(projs, sequence(lit(0), lit(nBits - 1)),
        (p, b) => when(p >= 0, call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(lit(0L))),
      lit(0L), (s, v) => s.bitwiseOR(v))
  }
}
