package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * that turns pairwise near-duplicate candidates ([[TextDedup]] / [[Knn]]
  * pairs) into dedup groups with a canonical representative (min id), the
  * standard shape of corpus-level deduplication in training-data pipelines.
  *
  * Spark-first plan: iterative min-label propagation. Every vertex starts
  * labeled with its own id; each round joins labels across edges (both
  * directions), takes the min incoming label per vertex, and stops when no
  * label changed. Each round costs one equi-join shuffle + one aggregation,
  * and eagerly `localCheckpoint`s so the plan never grows with the
  * iteration count. Rounds needed = graph diameter, which for near-dup
  * clusters is tiny (dup groups are dense); `maxIter` bounds pathological
  * chains. For billion-edge graphs with long chains, swap the body for the
  * alternating small-star/large-star algorithm (same contract); label
  * propagation is the right default for dedup-shaped graphs.
  */
object ConnectedComponents {

  /** @return (id, component) — component = min vertex id reachable.
    *         Vertices absent from `edges` keep their own id.
    */
  def components(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                 idCol: String, aCol: String, bCol: String,
                 maxIter: Int = 25): DataFrame = {
    // duplicate edges are harmless (min is idempotent) — no distinct pass
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true)
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("lbl"),
        lit(true).as("changed"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // frontier propagation: only labels that changed last round can lower
      // a neighbor's label, so each round joins the (shrinking) frontier —
      // after round one that is the dup-cluster vertices, not the corpus
      val frontier = labels.where(col("changed"))
      val neighborMin = sym.join(frontier, sym("src") === frontier("id"))
        .select(col("dst").as("id"), col("lbl"))
        .groupBy("id").agg(min("lbl").as("nmin"))
      // carry a changed flag so convergence is a scan of the materialized
      // round, not another join against the previous labels
      val next = labels.drop("changed").join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"),
          (col("nmin").isNotNull && col("nmin") < col("lbl")).as("changed"))
        .localCheckpoint(true)
      converged = next.where(col("changed")).limit(1).isEmpty
      labels.unpersist()
      labels = next
      iter += 1
    }
    sym.unpersist()
    // silently returning half-propagated labels would hand callers wrong
    // dedup groups — fail loudly like the rest of the library
    require(converged,
      s"connected components did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter — raise it)")
    labels.select(col("id").as(idCol), col("lbl").as("component"))
  }
}
