package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle into training shards — the delivery step of
  * a training-data pipeline: after mixing/packing, the corpus must reach
  * the trainer as N shard files in a seed-reproducible pseudo-random order
  * (so a run can be resumed, audited, or exactly re-created on a different
  * cluster). `orderBy(rand(seed))` does NOT give that guarantee — Spark's
  * `rand` is seeded PER PARTITION, so the permutation changes with the
  * partition count and input order. Here both the shard assignment and the
  * within-shard position are pure functions of `(seed, id)`: content-hash
  * order, the same trick the reference uses for reproducible row shuffles
  * (`src/glue/jobs/compare_parquet_datasets.py` sorts sampled rows by a
  * stable key) made global.
  *
  * Scale shape: one shuffle keyed by the shard id places rows; each
  * shard sorts locally by its 16-byte order key (Spark's external sort —
  * spills, never OOMs). No global sort, no driver state, no skew: md5
  * spreads any id distribution uniformly, so shards are balanced to
  * O(sqrt(n/numShards)) fluctuations. At 100 TB with numShards sized to
  * ~1-4 GB per shard this is exactly one well-shaped exchange.
  */
object Shards {

  /** Shard assignment + within-shard order for every row: adds
    * `shard: int` (in `[0, numShards)`), `ord: string` (the 32-hex order
    * key), and `pos: long` (1-based rank within the shard). Shard and
    * order use independently salted hashes — deriving both from one hash
    * would correlate a shard's contents with its internal order.
    * Deterministic across cluster layout, partition count, and input row
    * order; ties broken by id (md5 collisions at 2^-64 per pair).
    */
  def assign(df: DataFrame, idCol: String, numShards: Int,
             seed: Long = 42L): DataFrame = {
    require(numShards > 0, s"numShards > 0: $numShards")
    val taken = Seq("shard", "ord", "pos").filter(df.columns.contains)
    require(taken.isEmpty,
      s"input already has column(s) ${taken.mkString(", ")} — assign would " +
      "silently overwrite them; rename or drop before sharding")
    val idStr = col(idCol).cast("string")
    val shardKey = md5(concat(lit(s"$seed:shard:"), idStr).cast("binary"))
    val ordKey = md5(concat(lit(s"$seed:ord:"), idStr).cast("binary"))
    // 32-bit shard key (8 hex chars): a 16-bit key wraps its modulo at
    // real shard counts — at 100 TB and 1-4 GB/shard, numShards is
    // 25k-100k, where 65,536 preimages would give low shard ids twice
    // the mass and ids past 2^16 none at all
    val shard = (conv(substring(shardKey, 1, 8), 16, 10).cast("long")
      % numShards).cast("int")
    df.withColumn("shard", shard)
      .withColumn("ord", ordKey)
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard")
          .orderBy(col("ord").asc, col(idCol).asc)).cast("long"))
  }

  /** Write the corpus as `numShards` hive directories `shard=K/`, each
    * containing its rows in the deterministic shuffle order. The physical
    * plan is the scale-shaped one: `repartition(shard)` is the single
    * placement exchange, `sortWithinPartitions` is the per-shard external
    * sort, and the writer emits one ordered file per shard directory. The
    * `ord` key is dropped from the output — it is derivable from
    * `(seed, id)` and would double the key bytes written.
    */
  def write(df: DataFrame, idCol: String, numShards: Int, path: String,
            seed: Long = 42L): Unit = {
    assign(df, idCol, numShards, seed)
      .drop("pos") // rank is implied by file order; avoid the rank window
      // range, not hash, partitioning on the shard id: hashing numShards
      // distinct values into numShards partitions co-locates some shards
      // (2x straggler tasks) and leaves others empty; range boundaries put
      // ~one shard per task (correctness is independent of task placement
      // — partitionBy splits the directories either way)
      .repartitionByRange(numShards, col("shard"))
      // shard leads the sort so the writer sees its required
      // partition-column ordering and keeps ours — otherwise
      // FileFormatWriter inserts its own (unstable) sort on `shard` and
      // the per-file order is lost
      .sortWithinPartitions(col("shard").asc, col("ord").asc, col(idCol).asc)
      .drop("ord")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
