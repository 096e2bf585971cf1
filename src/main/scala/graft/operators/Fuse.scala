package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combine the ranked result lists of
  * several retrievers (BM25 sparse, dense ANN, ...) into one list per
  * query with Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09):
  * `score(item) = Σ_runs 1/(c + rank_run(item))`, the standard fusion
  * in hybrid (lexical + embedding) retrieval stacks.
  *
  * Scale shape: each run is already top-k per query, so every input is
  * queries x k rows — tiny relative to the corpora that produced them. The
  * union groups on (query, item) in one shuffle of those small lists;
  * per-query ranking is the `graft_kmin` k-capped heap, not a sort. RRF
  * sees only ids and integer ranks — the 100 TB work stays inside the
  * upstream retrievers.
  *
  * Portability: each reciprocal is a single correctly-rounded double
  * division of exact integers, rounded to 9 decimals; the per-item sum is
  * then an exact fixed-point long addition ([[Bm25]]'s trick) —
  * order-independent, reproduced bit-for-bit by any engine.
  */
object Fuse {

  /** Fuse `runs` (each `(qCol, idCol, rankCol)`-shaped, rank 1-based) into
    * top-`k` rows `(q, item, score, rank)` per query. Items missing from a
    * run simply contribute nothing for that run (standard RRF). Ties break
    * by ascending item id. `c` dampens the head of each list (60 is the
    * original paper's constant).
    */
  def rrf(runs: Seq[DataFrame], qCol: String, idCol: String, rankCol: String,
          k: Int, c: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrf requires at least one run")
    require(k > 0, s"k must be positive, got $k")
    graft.GraftFunctions.register(runs.head.sparkSession)
    val tagged = runs.zipWithIndex.map { case (r, i) =>
      r.select(col(qCol).as("q"), col(idCol).as("item"),
        round(lit(1.0) / (lit(c) + col(rankCol).cast("long")), 9).as("contrib"))
    }.reduce(_ unionByName _)
    // fixed-point exact sum of the 9-decimal reciprocals (see Bm25.score):
    // order-independent long addition, no per-group list state
    val scored = tagged.groupBy("q", "item")
      .agg(round(sum(round(col("contrib") * 1e9, 0).cast("long"))
        .cast("double") / 1e9, 9).as("score"))
    topKPerQuery(scored, qCol, idCol, k)
  }

  /** Weighted linear fusion over min-max-normalized scores — the other
    * standard hybrid combiner (`alpha * dense + (1-alpha) * sparse`, as in
    * dense-passage-retrieval hybrid baselines): each run's scores are
    * normalized to [0, 1] PER QUERY over that run's own top-k rows — a run
    * handed in with MORE than k rows per query is truncated to its top-k
    * (score desc, item asc) first, so the normalization range always
    * matches the documented contract — (constant lists normalize to 1),
    * scaled by the run's weight, and
    * summed per (query, item). Items absent from a run contribute nothing
    * for it. Unlike [[rrf]] this uses score MAGNITUDES, so a run with a
    * decisive margin can outvote a run with a flat one.
    *
    * Same scale shape as [[rrf]]: inputs are queries × k rows, the
    * per-(run, query) min/max window partitions hold ≤ k rows, and the
    * per-item sum folds 6-decimal fixed-point longs (order-independent,
    * engine-portable).
    */
  def linear(runs: Seq[(DataFrame, Double)], qCol: String, idCol: String,
             scoreCol: String, k: Int): DataFrame = {
    require(runs.nonEmpty, "linear fusion requires at least one run")
    require(k > 0, s"k must be positive, got $k")
    graft.GraftFunctions.register(runs.head._1.sparkSession)
    val wq = org.apache.spark.sql.expressions.Window.partitionBy("q")
    val tagged = runs.zipWithIndex.map { case ((r, w), i) =>
      val raw = r.select(col(qCol).as("q"), col(idCol).as("item"),
        col(scoreCol).cast("double").as("s"))
      // enforce the documented per-query top-k contract: a run handed in
      // with more than k rows per query is truncated (score desc, item asc)
      // BEFORE min/max normalization — otherwise the tail rows would widen
      // the normalization range and diverge from the rank<=k oracle shape.
      // kmin heap, not a sort; inputs are queries x list rows, so the extra
      // shuffle carries k-capped heaps only
      val topk = raw.groupBy("q")
        .agg(call_function("graft_kmin",
          struct((-col("s")).as("o"), col("item"), col("s")), lit(k)).as("tk"))
        .select(col("q"), explode(col("tk")).as("e"))
        .select(col("q"), col("e.item").as("item"), col("e.s").as("s"))
      topk
        .withColumn("mn", min("s").over(wq))
        .withColumn("mx", max("s").over(wq))
        .select(col("q"), col("item"),
          // stable rounding on BOTH normalization steps: the normalized
          // value is a small-denominator rational and `w × k/1e6` ties at
          // every 7th-digit 5, exactly where Spark round and DuckDB round
          // disagree — see functions.Rounding (found at sf0.1)
          graft.functions.Rounding.round6(
            lit(w) * when(col("mx") === col("mn"), lit(1.0))
              .otherwise(graft.functions.Rounding.round6(
                (col("s") - col("mn")) / (col("mx") - col("mn")))))
            .as("contrib"))
    }.reduce(_ unionByName _)
    val scored = tagged.groupBy("q", "item")
      .agg(round(sum(round(col("contrib") * 1e6, 0).cast("long"))
        .cast("double") / 1e6, 6).as("score"))
    topKPerQuery(scored, qCol, idCol, k)
  }

  /** `(q, item, score)` → top-`k` rows per query via the `graft_kmin`
    * k-capped heap (never a per-query sort); ties break by ascending item.
    */
  private def topKPerQuery(scored: DataFrame, qCol: String, idCol: String,
                           k: Int): DataFrame =
    scored.groupBy("q")
      .agg(call_function("graft_kmin",
        struct((-col("score")).as("o"), col("item"), col("score")),
        lit(k)).as("tk"))
      .select(col("q"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("q").as(qCol), col("e.item").as(idCol),
        col("e.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
}
