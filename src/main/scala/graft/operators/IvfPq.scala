package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ — the canonical billion-scale ANN read path (Jégou et al., TPAMI
  * 2011; the layout behind FAISS's IndexIVFPQ): coarse-quantize the corpus
  * into [[Ivf]] cells AND store each vector's [[Pq]] codes next to its
  * cell assignment. A query then
  *
  *   1. probes its `nProbe` nearest cells (broadcast centroids, kmin heap),
  *   2. ADC-scores ONLY those cells' rows — and only their 8-byte code
  *      column, thanks to parquet column pruning + `partitionBy("cell")`
  *      directory pruning on a persisted index,
  *   3. exact-reranks a per-query shortlist by true cosine — the only rows
  *      whose float vectors are ever read, via a semi-join-shaped id join
  *      against the same cell-pruned store.
  *
  * At 100 TB the read is nProbe/nCells of the files x (codes column only)
  * — two multiplicative reductions before any vector math happens.
  */
object IvfPq {

  final case class Index(ivf: Ivf.Index, cb: Pq.Codebooks, coded: DataFrame)

  /** Build both quantizers and the combined `(id, emb, cell, codes)`
    * table in one narrow pass over the assigned corpus.
    */
  def build(corpus: DataFrame, nCells: Int, m: Int = 8, kc: Int = 16,
            id: String = "vec_id", vec: String = "embedding", dim: Int = 64,
            trainSample: Int = 100000, seed: Long = 42L,
            payload: Seq[String] = Nil): Index = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val ivf = Ivf.build(corpus, nCells, id, vec, trainSample, seed, payload)
    val cb = Pq.train(corpus, m, kc, vec, dim, trainSample, seed)
    val coded = ivf.assigned.withColumn("codes",
      Pq.encodeExpr(normalizeFast(col("emb")), cb))
    Index(ivf, cb, coded)
  }

  /** Persist: coded corpus `partitionBy("cell")` (codes AND vectors — the
    * columnar format means ADC scans read only the code column), centroids
    * and flattened codebooks alongside. `partitionPayload` lifts dominant
    * filter attributes above `cell` in the directory layout, exactly as
    * [[Ivf.write]] (same trade, same `layout` marker preserved by
    * [[append]]/[[compactTo]]).
    */
  def write(index: Index, path: String,
            partitionPayload: Seq[String] = Nil): Unit = {
    val missing = partitionPayload.filterNot(index.coded.columns.contains)
    require(missing.isEmpty,
      s"partitionPayload columns not in the index: ${missing.mkString(",")}")
    index.coded.withColumn("batch_id", lit(0L)).repartition(col("cell"))
      .write.mode("overwrite")
      .partitionBy(partitionPayload :+ "cell" :+ "batch_id": _*)
      .parquet(s"$path/cells")
    index.ivf.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    // unconditional manifest write (as Ivf.write): a default-layout rewrite
    // must replace a stale partitioned-layout marker. batch_id reserved for
    // the same reason as Ivf.write — a re-opened index carries it
    Ivf.writeLayout(index.coded, path, partitionPayload,
      reserved = Set("id", "emb", "cell", "codes", "batch_id"))
    val s = index.coded.sparkSession
    import s.implicits._
    index.cb.centers.zipWithIndex
      .flatMap { case (cs, mi) => cs.zipWithIndex.map { case (c, j) => (mi, j, c) } }
      .toDF("mi", "j", "center")
      .write.mode("overwrite").parquet(s"$path/codebooks")
    Seq((index.cb.m, index.cb.kc, index.cb.dim)).toDF("m", "kc", "dim")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  def open(spark: SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val coded = spark.read.parquet(s"$path/cells")
    Index(Ivf.Index(centroids, coded.drop("codes"), centroids.count().toInt),
      readCodebooks(spark, path), coded)
  }

  private def readCodebooks(spark: SparkSession, path: String): Pq.Codebooks = {
    val p = spark.read.parquet(s"$path/params").head()
    val (m, kc, dim) = (p.getAs[Int]("m"), p.getAs[Int]("kc"), p.getAs[Int]("dim"))
    val centers = spark.read.parquet(s"$path/codebooks")
      .collect().map(r => (r.getAs[Int]("mi"), r.getAs[Int]("j"), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    Pq.Codebooks(m, kc, dim, centers)
  }

  /** Encode a new batch with the STORED centroids AND codebooks, appending
    * `(id, emb, codes)` rows to the cell directories — [[Ivf.append]]'s
    * daily-ingest path with the PQ code column computed in the same narrow
    * pass. Neither quantizer retrains (codebook drift degrades ADC
    * precision gradually, never correctness — the exact rerank reads true
    * vectors); rebuild when cell skew or recall says so.
    *
    * RETRY-IDEMPOTENT as [[Ivf.append]]: the batch's rows land under its
    * own `batch_id` inner partitions via dynamic partition overwrite
    * (assignment and encoding are deterministic given the stored
    * centroids/codebooks, so a replayed attempt rewrites exactly the same
    * partition set). Distinct batches need distinct ids > 0.
    */
  def append(df: DataFrame, path: String, batchId: Long,
             id: String = "vec_id", vec: String = "embedding",
             payload: Seq[String] = Nil): Unit = {
    require(batchId > 0, s"batchId must be > 0 (0 is the base build): $batchId")
    val spark = df.sparkSession
    graft.GraftFunctions.register(spark)
    // store-defined payload contract, as [[Ivf.append]] — a narrower append
    // would read back with null payloads and vanish from filtered queries
    // resolvePayload also returns the store's lifted directory layout
    val (pay, layout) = Ivf.resolvePayload(spark, path, payload, df,
      reserved = Set("id", "emb", "cell", "batch_id", "codes"))
    val cb = readCodebooks(spark, path)
    val centers = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getAs[Int]("cell"), r.getSeq[Double](r.fieldIndex("centroid"))))
      .sortBy(_._1).map(_._2)
    df.select(col(id).as("id") +: col(vec).as("emb") +: pay.map(col): _*)
      .withColumn("cell", Ivf.assignCell(col("emb"), centers))
      .withColumn("codes", Pq.encodeExpr(normalizeFast(col("emb")), cb))
      .withColumn("batch_id", lit(batchId))
      .repartition(col("cell"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(layout :+ "cell" :+ "batch_id": _*).parquet(s"$path/cells")
  }

  /** Rewrite a persisted index into a fresh fully-compacted store at
    * `dest` — [[Ivf.compactTo]]'s small-files maintenance pass for the
    * coded layout (cells collapse to batch 0, one co-located shuffle
    * partition per cell; centroids/codebooks/params copied through).
    * Writes to a NEW directory; the atomic swap is the caller's
    * snapshot/publish step. A payload-partitioned layout carries through;
    * the source manifest is copied verbatim (see [[Ivf.compactTo]]).
    */
  def compactTo(spark: SparkSession, path: String, dest: String): Unit = {
    write(open(spark, path), dest, Ivf.storedLayout(spark, path))
    Ivf.copyLayoutManifest(spark, path, dest)
  }

  /** Top-k per query: probe → ADC within probed cells → exact rerank.
    * Output `(q_id, n_id, sim, rank)`. `pruneCells` pushes the probed cell
    * set as a static filter (directory pruning on a persisted index).
    * `filter`: optional predicate over payload columns (see [[build]]) —
    * applied before the ADC scan, so the predicate pushes into the
    * probed-cell parquet read; post-filter top-k semantics as
    * [[Ivf.query]].
    */
  def query(index: Index, queries: DataFrame, k: Int, nProbe: Int,
            qId: String = "vec_id", qVec: String = "embedding",
            excludeSelf: Boolean = true, shortlist: Int = 50,
            pruneCells: Boolean = true, filter: Option[Column] = None): DataFrame = {
    graft.GraftFunctions.register(index.coded.sparkSession)
    // probe in RAW space — the IVF centroids are trained and the corpus
    // assigned on raw vectors ([[Ivf.build]]), and [[Ivf.query]] probes
    // raw; probing with the normalized query against raw-space centroids
    // would rank cells by centroid magnitude for any non-unit-norm corpus
    // and silently collapse recall. The normalized form takes over only
    // for ADC (the codebooks are trained on normalized vectors) and the
    // cosine rerank.
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_emb"))
    // the probe subplan runs once for the eager cell collect and once in
    // the ADC join — accepted, see Ivf.query's note (a localCheckpoint
    // barrier measured 2x slower on the lifecycle gate)
    val probes = Ivf.probeCells(index.ivf, q, nProbe)
      .withColumn("q_emb", normalizeFast(col("q_emb")))
      .withColumn("tbl", Pq.adcTable(col("q_emb"), index.cb))
    val pruned =
      if (pruneCells) {
        // ≤ nCells values by construction — always collectable
        val cells = probes.select("cell").distinct().collect().map(_.getInt(0))
        index.coded.where(col("cell").isin(cells.map(Integer.valueOf): _*))
      } else index.coded
    val corpus = filter.map(pruned.where).getOrElse(pruned)
    // candidates: only probed cells' rows, only their code column does work
    val scored = corpus.select(col("id"), col("cell"), col("codes"))
      .join(probes, Seq("cell"))
      .where(if (excludeSelf) col("q_id") =!= col("id") else lit(true))
      .select(col("q_id"), col("q_emb"), col("id"),
        call_function("graft_pq_adc", col("codes"), col("tbl")).as("adist"))
    val cand = math.max(k, shortlist)
    val top = scored.groupBy("q_id")
      .agg(first(col("q_emb")).as("q_emb"),
        call_function("graft_kmin",
          struct(col("adist").as("o"), col("id")), lit(cand)).as("tk"))
      .select(col("q_id"), col("q_emb"), explode(col("tk.id")).as("n_id"))
    // exact rerank: the only stage that reads float vectors, and only for
    // the queries x shortlist candidate ids — joined against the SAME
    // cell-pruned store as the ADC scan, so on a persisted index the
    // vector read also touches only the nProbe probed cell directories
    top.join(corpus.select(col("id").as("n_id"),
        normalizeFast(col("emb")).as("n_vec")), Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dotFast(col("q_emb"), col("n_vec")), 6).as("sim"))
      .groupBy("q_id")
      .agg(call_function("graft_kmin",
        struct((-col("sim")).as("o"), col("n_id"), col("sim")),
        lit(k)).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.n_id").as("n_id"),
        col("e.sim").as("sim"), (col("pos") + 1).cast("int").as("rank"))
  }
}
