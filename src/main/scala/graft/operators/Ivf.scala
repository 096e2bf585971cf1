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

  /** Deterministic per-partition reservoir sample of ≤ `maxRows` rows with
    * NO pre-count pass: the P input partitions share a balanced integer
    * quota summing to exactly `maxRows` (partitions beyond `maxRows` get
    * quota 0), each kept via a seeded reservoir in one lazy narrow pass —
    * unlike `df.sample(fraction)`, which needs a full `count()` job first to
    * compute the fraction (a whole extra corpus scan at 100 TB). Partitions
    * smaller than their quota contribute everything they have (mild skew
    * toward small partitions — fine for sketching/training uses). Genuine
    * per-partition imperative logic, hence the one RDD hop.
    */
  def boundedSample(df: DataFrame, maxRows: Int, seed: Long = 42L): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.rdd
    val nPart = math.max(1, rdd.getNumPartitions)
    val sampled = rdd.mapPartitionsWithIndex { (pid, it) =>
      // balanced integer quota: per-partition shares sum to EXACTLY maxRows
      // (a floor-with-min-1 would blow past the cap when partitions
      // outnumber maxRows — 800k partitions x 1 row is 8x a 100k cap)
      val quota = (((pid + 1).toLong * maxRows) / nPart -
        (pid.toLong * maxRows) / nPart).toInt
      if (quota == 0) Iterator.empty
      else {
        val rnd = new java.util.Random(seed ^ (pid.toLong * 0x9E3779B97F4A7C15L))
        val buf = new Array[org.apache.spark.sql.Row](quota)
        var n = 0
        while (it.hasNext) {
          val r = it.next()
          if (n < quota) buf(n) = r
          else {
            val j = rnd.nextInt(n + 1)
            if (j < quota) buf(j) = r
          }
          n += 1
        }
        buf.iterator.take(math.min(n, quota))
      }
    }
    spark.createDataFrame(sampled, schema)
  }

  /** Build the index: KMeans centroids (trained on up to ~`trainSample`
    * rows, sampled without a pre-count) + cell assignment for every corpus
    * vector.
    */
  def build(corpus: DataFrame, nCells: Int, id: String = "vec_id",
            vec: String = "embedding", trainSample: Int = 100000,
            seed: Long = 42L): Index = {
    val spark = corpus.sparkSession
    val withVec = corpus.select(col(id).as("id"), col(vec).as("emb"))
      .withColumn("features", array_to_vector(
        // KMeans wants double vectors
        transform(col("emb"), _.cast("double"))))
    val train = boundedSample(withVec.select("features"), trainSample, seed)
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(20)
      .fit(train)
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
