package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * Design for 100 TB: the corpus never moves — the (small) query set is
  * broadcast to every corpus partition, similarity is computed in a narrow
  * map, and only `k` rows per (query, partition) survive to the final top-k
  * shuffle. The LSH variant additionally prunes the corpus scan to matching
  * hash buckets before any similarity math.
  */
object Knn {

  /** Exact brute-force top-k by cosine similarity.
    *
    * `queries` is broadcast (it must be small — the typical "find neighbors
    * of these N probes" shape). The ranking aggregates with `graft_kmin`
    * (a k-capped heap `TypedImperativeAggregate`): map-side partial
    * aggregation reduces every task to ≤k candidates per query BEFORE the
    * shuffle, so the exchange carries queries×partitions heap rows (≤k
    * entries each) instead of queries×corpus scored rows — the difference
    * between shuffling kilobytes and shuffling the corpus at 10⁹ rows.
    * Ordering matches `row_number() over (order by sim desc, n_id asc)`:
    * the heap key is the lexicographic struct `(-sim, n_id)`.
    */
  def bruteForce(queries: DataFrame, corpus: DataFrame, k: Int,
                 qId: String = "vec_id", cId: String = "vec_id",
                 qVec: String = "embedding", cVec: String = "embedding",
                 excludeSelf: Boolean = true): DataFrame = {
    // Self-register so bruteForce works on any session, not just ones that
    // already ran GraftFunctions.register / GraftExtensions (idempotent;
    // same pattern as Layout.zorderQuantile).
    graft.GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(qId).as("q_id"), normalizeFast(col(qVec)).as("q_vec")))
    val c = corpus.select(col(cId).as("n_id"), normalizeFast(col(cVec)).as("n_vec"))
    val scored = c.crossJoin(q)
      .where(if (excludeSelf) col("q_id") =!= col("n_id") else lit(true))
      .select(col("q_id"), col("n_id"), round(dotFast(col("q_vec"), col("n_vec")), 6).as("sim"))
    val topk = scored.groupBy("q_id").agg(
      call_function("graft_kmin",
        struct((-col("sim")).as("o"), col("n_id"), col("sim")), lit(k)).as("tk"))
    topk.select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.n_id").as("n_id"), col("e.sim").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** LSH-bucketed ANN: restrict candidates to corpus vectors sharing a
    * random-hyperplane signature band with the query, then exact-rank within
    * candidates. Recall is tunable via bands (more bands → more candidates).
    * The join shuffles on the band hash — no cross product, linear in
    * collisions; this is the 100 TB path (bruteForce is the correctness
    * baseline).
    */
  def lsh(queries: DataFrame, corpus: DataFrame, k: Int,
          nBits: Int = 64, bandBits: Int = 8,
          qId: String = "vec_id", cId: String = "vec_id",
          qVec: String = "embedding", cVec: String = "embedding",
          excludeSelf: Boolean = true): DataFrame = {
    val nBands = nBits / bandBits
    def withBands(df: DataFrame, id: String, vec: String, pfx: String): DataFrame = {
      val sig = hyperplaneLshFast(col(vec), nBits)
      df.select(col(id).as(s"${pfx}_id"), normalizeFast(col(vec)).as(s"${pfx}_vec"),
        posexplode(array((0 until nBands).map(b =>
          shiftright(sig, b * bandBits).bitwiseAND((1L << bandBits) - 1)): _*))
          .as(Seq("band_idx", "band")))
    }
    graft.GraftFunctions.register(corpus.sparkSession)
    val qb = withBands(queries, qId, qVec, "q")
    val cb = withBands(corpus, cId, cVec, "n")
    // Score per banded collision, then dedupe on the compact (q_id, n_id)
    // pair — never shuffle the vectors themselves through a distinct.
    val scored = qb.join(cb, Seq("band_idx", "band"))
      .where(if (excludeSelf) col("q_id") =!= col("n_id") else lit(true))
      .select(col("q_id"), col("n_id"),
        round(dotFast(col("q_vec"), col("n_vec")), 6).as("sim"))
      .groupBy("q_id", "n_id").agg(max("sim").as("sim"))
    // Final top-k with the same k-capped heap as bruteForce: the pair-dedup
    // groupBy already bounds the input, but the heap still cuts the last
    // exchange to ≤k rows per (query, partition) and drops the sort.
    val topk = scored.groupBy("q_id").agg(
      call_function("graft_kmin",
        struct((-col("sim")).as("o"), col("n_id"), col("sim")), lit(k)).as("tk"))
    topk.select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.n_id").as("n_id"), col("e.sim").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Cosine near-duplicate pairs over the corpus itself: LSH-bucket the
    * corpus, pair within buckets, keep pairs with similarity >= threshold.
    *
    * Band width sets the bucket CAPACITY, and capacity is what makes this
    * sublinear: each band has `2^bandBits` bucket values, so the expected
    * bucket holds `n / 2^bandBits` rows and the within-bucket pairing is
    * quadratic in that. The 64/8 default (8 bands x 256 buckets) keeps
    * ~93% recall at sim 0.9 while pruning ~255/256 of the corpus per
    * band; a 4-bit band (16 buckets) stops pruning past ~10^5 rows —
    * every bucket then exceeds `maxBucketSize` and the degeneracy cap,
    * which exists to drop a FEW pathological buckets, would silently
    * empty the result. Widen `bandBits` (and `nBits` with it) before
    * raising `maxBucketSize`.
    */
  def cosineNearDup(corpus: DataFrame, threshold: Double,
                    id: String = "vec_id", vec: String = "embedding",
                    nBits: Int = 64, bandBits: Int = 8,
                    maxBucketSize: Int = 10000): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val nBands = nBits / bandBits
    val sig = hyperplaneLshFast(col(vec), nBits)
    val banded = corpus.select(col(id).as("id"), normalizeFast(col(vec)).as("v"),
      posexplode(array((0 until nBands).map(b =>
        shiftright(sig, b * bandBits).bitwiseAND((1L << bandBits) - 1)): _*))
        .as(Seq("band_idx", "band")))
    val bounded = Caps.capGroupSize(banded, maxBucketSize, "band_idx", "band")
    val a = bounded.select(col("band_idx"), col("band"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bounded.select(col("band_idx"), col("band"), col("id").as("id_b"), col("v").as("v_b"))
    // threshold BEFORE the pair-dedup: the filter drops ~all banded
    // collisions, so the distinct shuffles only surviving near-dup pairs
    a.join(b, Seq("band_idx", "band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(dotFast(col("v_a"), col("v_b")), 6).as("sim"))
      .where(col("sim") >= threshold)
      .distinct()
  }
}
