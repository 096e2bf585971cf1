package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into KMeans cells once, then answer queries by scanning only the
  * `nProbe` cells nearest each query — the classic coarse-quantization ANN
  * index, built from Spark MLlib primitives.
  *
  * Scale notes: training samples the corpus (KMeans on a bounded sample);
  * assignment is one narrow pass; the index is the corpus re-partitioned
  * (and prunable) by `cell`. A query touches nProbe/nCells of the data —
  * with the index written `partitionBy("cell")`, cell pruning happens at
  * the parquet scan. Recall/latency trades via nProbe.
  */
object Ivf {

  final case class Index(centroids: DataFrame, assigned: DataFrame,
                         nCells: Int)

  /** Build the index: KMeans centroids (trained on up to `trainSample`
    * rows) + cell assignment for every corpus vector.
    */
  def build(corpus: DataFrame, nCells: Int, id: String = "vec_id",
            vec: String = "embedding", trainSample: Int = 100000,
            seed: Long = 42L): Index = {
    val spark = corpus.sparkSession
    val withVec = corpus.select(col(id).as("id"), col(vec).as("emb"))
      .withColumn("features", array_to_vector(
        // KMeans wants double vectors
        transform(col("emb"), _.cast("double"))))
    val n = withVec.count()
    val train = if (n > trainSample)
      withVec.sample(withReplacement = false, trainSample.toDouble / n, seed) else withVec
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(20)
      .fit(train.select("features"))
    val assigned = model.transform(withVec)
      .select(col("id"), col("emb"), col("prediction").as("cell"))
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toArray) }
      .toDF("cell", "centroid")
    Index(centroids, assigned, nCells)
  }

  /** Query: rank cells per query by centroid distance, keep `nProbe`,
    * then exact cosine top-k inside the probed cells only. Centroids are
    * tiny → broadcast; the candidate join shuffles on `cell`.
    */
  def query(index: Index, queries: DataFrame, k: Int, nProbe: Int,
            qId: String = "vec_id", qVec: String = "embedding",
            excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_emb"))
    val qCells = q.crossJoin(broadcast(index.centroids))
      .select(col("q_id"), col("q_emb"), col("cell"),
        l2Distance(col("q_emb"), col("centroid")).as("cdist"))
    val wCell = Window.partitionBy("q_id").orderBy(col("cdist").asc, col("cell").asc)
    val probes = qCells.withColumn("cr", row_number().over(wCell))
      .where(col("cr") <= nProbe)
      .select("q_id", "q_emb", "cell")
    val cand = probes.join(index.assigned, "cell")
      .where(if (excludeSelf) col("q_id") =!= col("id") else lit(true))
    val scored = cand.select(col("q_id"), col("id").as("n_id"),
      round(cosineFast(col("q_emb"), col("emb")), 6).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
