package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou/Douze/Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split each d-dim vector into
  * `m` subvectors, KMeans each subspace to `kc` centers, and store every
  * vector as m small codes. With m=8, kc=16 a 64-dim float32 vector (256 bytes)
  * becomes 8 codes — a 32x smaller corpus to scan, cache, and shuffle.
  * Queries score candidates with an ADC (asymmetric distance computation)
  * lookup table — m table lookups + adds per candidate, no float vector
  * math — then optionally re-rank a shortlist exactly.
  *
  * Scale shape: training runs on a bounded deterministic sample
  * ([[Ivf.boundedSample]]); encoding is one narrow pass (codebooks ride
  * along as plan literals); search broadcasts the query set WITH its
  * precomputed ADC tables, scans only the code column, and ranks with the
  * `graft_kmin` bounded-shuffle heap. The exact re-rank joins the
  * shortlist (queries x shortlist rows) back to the corpus — the only
  * stage that touches full vectors, and only for the shortlist.
  */
object Pq {

  /** `centers(mi)(j)` = center j of subspace mi, each of length d/m. */
  final case class Codebooks(m: Int, kc: Int, dim: Int,
                             centers: Seq[Seq[Seq[Double]]]) {
    def sub: Int = dim / m
  }

  /** Train per-subspace codebooks on a bounded sample of (normalized)
    * `vec`. The sample is collected to the driver (it is bounded by
    * `trainSample` BY CONSTRUCTION — ≤ trainSample x dim floats, a few MB,
    * never data-scale) and each subspace runs a seeded Lloyd's iteration
    * locally: m tiny k-means problems are driver math, not m distributed
    * jobs — on a cluster the alternative costs m job round-trips to fit
    * centers for 8-dimensional slices of a 10⁴-row sample. Deterministic:
    * seeded sample, seeded init, first-index tie-breaks.
    */
  def train(corpus: DataFrame, m: Int = 8, kc: Int = 16,
            vec: String = "embedding", dim: Int = 64,
            trainSample: Int = 100000, seed: Long = 42L): Codebooks = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    graft.GraftFunctions.register(corpus.sparkSession)
    val sub = dim / m
    val sample = Ivf.boundedSample(
        corpus.select(transform(normalizeFast(col(vec)), _.cast("double")).as("v")),
        trainSample, seed)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val centers = (0 until m).map { mi =>
      val pts = sample.map(v => Array.tabulate(sub)(i => v(mi * sub + i)))
      Lloyd.fit(pts, kc, iters = 10, seed + mi).map(_.toSeq).toSeq
    }
    Codebooks(m, kc, dim, centers)
  }

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Codes for one (normalized) vector column: `array<int>` of length m,
    * each the argmin-distance center in its subspace (first on ties).
    * Native expression — one tight loop per row; the codebooks ride as a
    * foldable literal cached per task (PqSpec asserts equality with the
    * interpreted HOF formulation).
    */
  def encodeExpr(vec: Column, cb: Codebooks): Column =
    call_function("graft_pq_encode", vec, typedlit(cb.centers))

  /** `(id, codes)` for the corpus — the persistable PQ index (32x smaller
    * than the vectors; write it like [[Ivf.write]] writes cells).
    */
  def encode(corpus: DataFrame, cb: Codebooks, id: String = "vec_id",
             vec: String = "embedding"): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    corpus.select(col(id).as("id"),
      encodeExpr(normalizeFast(col(vec)), cb).as("codes"))
  }

  /** Per-query ADC table: `table(mi)(j)` = l2sq(query subvector mi,
    * center j). m x kc doubles per query, computed once on the (small)
    * broadcast side.
    */
  private[operators] def adcTable(qvec: Column, cb: Codebooks): Column = {
    val cbLit = typedlit(cb.centers)
    transform(sequence(lit(0), lit(cb.m - 1)), mi => {
      val subvec = slice(qvec, mi * cb.sub + 1, lit(cb.sub))
      transform(element_at(cbLit, mi + 1),
        c => l2sq(subvec, transform(c, _.cast("float"))))
    })
  }

  /** Approximate top-`k` by ADC distance over the codes. If `rerank` is
    * given (the original corpus), a `shortlist`-sized ADC candidate set is
    * re-ranked by exact cosine — the standard PQ + exact-rerank pipeline.
    * `rId`/`rVec` name the rerank corpus's id/vector columns (defaulting
    * to the QUERY id column for the common self-search case — pass `rId`
    * whenever the two tables name their ids differently).
    * Output `(q_id, n_id, rank)` (+ `sim` when re-ranked).
    */
  def search(cb: Codebooks, codes: DataFrame, queries: DataFrame, k: Int,
             qId: String = "vec_id", qVec: String = "embedding",
             excludeSelf: Boolean = true, shortlist: Int = 50,
             rerank: Option[DataFrame] = None, rVec: String = "embedding",
             rId: Option[String] = None)
      : DataFrame = {
    graft.GraftFunctions.register(codes.sparkSession)
    val q = broadcast(queries.select(col(qId).as("q_id"),
      normalizeFast(col(qVec)).as("q_vec"))
      .withColumn("tbl", adcTable(col("q_vec"), cb)))
    val cand = math.max(k, if (rerank.isDefined) shortlist else k)
    val scored = codes.crossJoin(q)
      .where(if (excludeSelf) col("q_id") =!= col("id") else lit(true))
      .select(col("q_id"), col("q_vec"), col("id"),
        call_function("graft_pq_adc", col("codes"), col("tbl")).as("adist"))
    val top = scored.groupBy("q_id")
      .agg(first(col("q_vec")).as("q_vec"),
        call_function("graft_kmin",
          struct(col("adist").as("o"), col("id"), col("adist")),
          lit(cand)).as("tk"))
      .select(col("q_id"), col("q_vec"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("q_vec"), col("e.id").as("n_id"),
        col("e.adist").as("adist"), (col("pos") + 1).cast("int").as("rank"))
    rerank match {
      case None => top.drop("q_vec", "adist")
      case Some(corpus) =>
        // exact re-rank of the shortlist: join the candidate ids back to
        // their true vectors (queries x shortlist rows — tiny), re-score
        val exact = top.drop("adist", "rank")
          .join(corpus.select(col(rId.getOrElse(qId)).as("n_id"),
            normalizeFast(col(rVec)).as("n_vec")), Seq("n_id"))
          .select(col("q_id"), col("n_id"),
            round(dotFast(col("q_vec"), col("n_vec")), 6).as("sim"))
        exact.groupBy("q_id")
          .agg(call_function("graft_kmin",
            struct((-col("sim")).as("o"), col("n_id"), col("sim")),
            lit(k)).as("tk"))
          .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "e")))
          .select(col("q_id"), col("e.n_id").as("n_id"),
            col("e.sim").as("sim"), (col("pos") + 1).cast("int").as("rank"))
    }
  }
}
