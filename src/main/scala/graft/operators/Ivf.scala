package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into KMeans cells once, then answer queries by scanning only the
  * `nProbe` cells nearest each query — the classic coarse-quantization ANN
  * index.
  *
  * Scale notes: training samples the corpus (driver-side seeded k-means++
  * on a bounded sample — [[Lloyd]]);
  * assignment is one narrow pass; the index is the corpus re-partitioned
  * by `cell` and persisted `partitionBy("cell")` ([[write]]/[[open]]), so a
  * query's candidate read is PRUNED AT THE PARQUET SCAN to the probed
  * cells — `query` collects the ≤ nCells distinct probed cell ids (one
  * tiny queries×centroids job) and pushes them as a static partition
  * filter, touching nProbe/nCells of the files (IvfSpec asserts the file
  * count). Ranking shuffles k-capped heaps, not scored candidates
  * (`graft_kmin`, same bounded-exchange shape as [[Knn.bruteForce]]).
  * Recall/latency trades via nProbe.
  */
object Ivf {

  final case class Index(centroids: DataFrame, assigned: DataFrame,
                         nCells: Int)

  /** Persist the index: corpus vectors under `path/cells` partitioned by
    * `(cell, batch_id)` (re-partitioned so each cell's rows are co-located —
    * one shuffle now buys every future query its pruned scan), centroids
    * under `path/centroids`. Parquet on any Hadoop FS. `cell` stays the
    * outermost data partition level, so probed-cell directory pruning is
    * unaffected by the inner `batch_id` split that makes [[append]]
    * retry-idempotent (the base build is batch 0).
    *
    * `partitionPayload`: payload columns to LIFT INTO THE DIRECTORY LAYOUT
    * above `cell` (`label=X/cell=Y/batch_id=Z`) — the lever for a DOMINANT
    * filter attribute: a filtered query then prunes whole label directories
    * at file-listing time (zero I/O for non-matching labels) instead of
    * relying on row-group stats inside each probed cell. Use for
    * low-cardinality attributes that most filtered queries constrain
    * (tenant, language, source); leave row-level for high-cardinality or
    * rarely-filtered payload (every distinct value costs a directory per
    * cell, and small-file pressure multiplies accordingly). The layout is
    * recorded under `path/layout` so [[append]] and [[compactTo]] preserve
    * it; [[open]]/[[query]] need no changes — the lifted columns come back
    * as partition columns and the same `filter` argument prunes on them.
    */
  def write(index: Index, path: String,
            partitionPayload: Seq[String] = Nil): Unit = {
    val missing = partitionPayload.filterNot(index.assigned.columns.contains)
    require(missing.isEmpty,
      s"partitionPayload columns not in the index: ${missing.mkString(",")}")
    index.assigned.withColumn("batch_id", lit(0L)).repartition(col("cell"))
      .write.mode("overwrite")
      .partitionBy(partitionPayload :+ "cell" :+ "batch_id": _*)
      .parquet(s"$path/cells")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    // batch_id is reserved too: an index re-opened from disk carries it as
    // a partition column, and recording it as payload would make every
    // later append demand a batch_id column and fail (the compactTo path)
    writeLayout(index.assigned, path, partitionPayload,
      reserved = Set("id", "emb", "cell", "batch_id"))
  }

  /** Persist the store's layout manifest: the partition-payload column
    * order AND every payload column's name + type. Appends read this in
    * O(1) instead of re-listing the whole cells directory for its schema
    * (a payload-partitioned 100 TB store has tens of thousands of leaf
    * dirs), and the type record lets [[resolvePayload]] reject a
    * type-mismatched batch at append time. Written UNCONDITIONALLY — a
    * default-layout rewrite over a previously partitioned store must
    * replace the stale marker, or later appends would resurrect the old
    * directory layout and corrupt partition discovery.
    */
  private[operators] def writeLayout(assigned: DataFrame, path: String,
      partitionPayload: Seq[String], reserved: Set[String]): Unit = {
    val s = assigned.sparkSession
    import s.implicits._
    val payloadTypes = assigned.schema.fields
      .filterNot(f => reserved(f.name))
      .map(f => (f.name, f.dataType.catalogString)).toMap
    val rows = partitionPayload.zipWithIndex.map { case (c, i) =>
      (c, i, true, payloadTypes.getOrElse(c, "")) } ++
      payloadTypes.keys.toSeq.sorted.filterNot(partitionPayload.contains)
        .zipWithIndex.map { case (c, i) =>
          (c, partitionPayload.size + i, false, payloadTypes(c)) }
    rows.toDF("part_col", "pos", "lifted", "ddl_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/layout")
  }

  private case class Layout(lifted: Seq[String], types: Map[String, String])

  /** The layout manifest of a persisted store. Falls back to deriving
    * payload names AND types from the cells schema for stores written
    * before the manifest carried types — both the pre-r12 marker (lifted
    * columns only) and no marker at all. The fallback pays a cells
    * partition-discovery listing; r12+ stores never do.
    */
  private def readLayout(spark: SparkSession, path: String,
                         reserved: Set[String]): Layout = {
    def schemaTypes: Map[String, String] =
      spark.read.parquet(s"$path/cells").schema.fields
        .filterNot(f => reserved(f.name) || f.name == "batch_id")
        .map(f => f.name -> f.dataType.catalogString).toMap
    val p = new org.apache.hadoop.fs.Path(s"$path/layout")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) {
      val manifest = spark.read.parquet(s"$path/layout")
      val rows = manifest.collect()
      // format detection by SCHEMA, not by first row: the most common
      // store (no payload columns) writes a 0-row r12 manifest, and
      // classifying it pre-r12 would pay the full cells listing on every
      // append — the exact cost the manifest exists to avoid
      if (manifest.schema.fieldNames.contains("lifted")) {
        val sorted = rows.sortBy(_.getAs[Int]("pos"))
        return Layout(
          sorted.filter(_.getAs[Boolean]("lifted"))
            .map(_.getAs[String]("part_col")).toSeq,
          sorted.map(r => r.getAs[String]("part_col") ->
            r.getAs[String]("ddl_type")).toMap.filter(_._2.nonEmpty))
      }
      // pre-r12 marker: lifted column names only — the payload set and
      // types still come from the cells schema, or appends to an old
      // payload-partitioned store would see an empty payload contract
      return Layout(rows.sortBy(_.getAs[Int]("pos"))
        .map(_.getAs[String]("part_col")).toSeq, schemaTypes)
    }
    Layout(Nil, schemaTypes)
  }

  /** The partition-payload layout a store was written with (empty for the
    * default `cell/batch_id` layout).
    */
  private[operators] def storedLayout(spark: SparkSession, path: String): Seq[String] =
    readLayout(spark, path, Set("id", "emb", "cell")).lifted

  /** Open a persisted index. The `cells` scan keeps `cell` as a partition
    * column, so [[query]]'s probed-cell filter prunes whole directories at
    * file listing time — the 100 TB read path.
    */
  def open(spark: SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val assigned = spark.read.parquet(s"$path/cells")
    Index(centroids, assigned, centroids.count().toInt)
  }

  /** Encode a new batch with the STORED centroids and append its rows to
    * the cell directories — the daily-ingest path: no retraining, no
    * re-read of the standing corpus, one narrow assignment pass over the
    * batch plus a `mode("append")` write into `partitionBy("cell")`.
    *
    * Centroids do not move (standard IVF practice — FAISS's `add` does the
    * same): cell populations drift as the data distribution does, which
    * degrades probe recall gradually, not correctness — every vector still
    * lands in its argmin cell, so a query that probes that cell finds it.
    * Rebuild via [[build]]+[[write]] when drift makes cells lopsided
    * (watch cell-size skew via [[cellStats]]).
    *
    * RETRY-IDEMPOTENT: the batch lands under its own `batch_id` inner
    * partitions via dynamic partition overwrite, so a replayed append (an
    * orchestrator retrying a crashed daily-ingest step — the reference's
    * own cadence) REPLACES its prior attempt's rows instead of duplicating
    * them: cell assignment is deterministic given the stored centroids, so
    * both attempts write exactly the same `(cell, batch_id)` partition set.
    * Callers must give each DISTINCT batch a distinct id > 0 (0 is the
    * base build — reusing it would overwrite base partitions).
    */
  def append(df: DataFrame, path: String, batchId: Long,
             id: String = "vec_id", vec: String = "embedding",
             payload: Seq[String] = Nil): Unit = {
    require(batchId > 0, s"batchId must be > 0 (0 is the base build): $batchId")
    val spark = df.sparkSession
    // the STORE defines the payload schema: cells are read without
    // mergeSchema, so a batch appended with fewer payload columns would
    // surface those rows with null payload — and a later filtered query
    // would silently drop every one of them. Default (Nil) auto-carries the
    // stored payload set; an explicit mismatch fails loudly.
    // resolvePayload also hands back the store's directory layout, so a
    // payload-partitioned store keeps its lifted columns outermost
    val (pay, layout) = resolvePayload(spark, path, payload, df,
      reserved = Set("id", "emb", "cell", "batch_id"))
    val centers = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getAs[Int]("cell"), r.getSeq[Double](r.fieldIndex("centroid"))))
      .sortBy(_._1).map(_._2)
    df.select(col(id).as("id") +: col(vec).as("emb") +: pay.map(col): _*)
      .withColumn("cell", assignCell(col("emb"), centers))
      .withColumn("batch_id", lit(batchId))
      .repartition(col("cell"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(layout :+ "cell" :+ "batch_id": _*).parquet(s"$path/cells")
  }

  /** The payload columns a persisted cells store carries (from the layout
    * manifest — O(1), no cells listing; schema-derived for pre-manifest
    * stores), reconciled against an append's `payload` argument: empty
    * means carry the stored set; non-empty must MATCH it (the store's
    * schema is the contract — parquet cells are read without mergeSchema,
    * so a narrower append would surface null payloads and a wider one
    * would be silently dropped on read). Also verifies the appended frame
    * has the columns AT THE STORED TYPES, so both the missing-column and
    * the type-conflict failure happen loudly at append time, naming the
    * store — not at some later read as a schema-convert exception.
    * Returns `(payload columns, lifted partition layout)` so the append
    * paths read the manifest once, not twice.
    */
  private[operators] def resolvePayload(spark: SparkSession, path: String,
      payload: Seq[String], df: DataFrame,
      reserved: Set[String]): (Seq[String], Seq[String]) = {
    val layout = readLayout(spark, path, reserved)
    val stored = layout.types.keys.toSeq.sorted
    val pay = if (payload.isEmpty) stored else payload
    require(pay.toSet == stored.toSet,
      s"append payload ${pay.sorted.mkString("[", ",", "]")} does not match " +
      s"the store's payload columns ${stored.mkString("[", ",", "]")} " +
      s"at $path/cells — appended rows would read back with null payload " +
      "and silently vanish from filtered queries; pass the stored payload " +
      "set (or Nil to auto-carry it)")
    val dfCols = df.columns.toSet
    val missing = stored.filterNot(dfCols)
    require(missing.isEmpty,
      s"appended batch lacks the store's payload column(s) " +
      s"${missing.mkString("[", ",", "]")} required by $path/cells")
    val mismatched = stored.flatMap { c =>
      val got = df.schema(c).dataType.catalogString
      layout.types.get(c).filter(t => t.nonEmpty && t != got)
        .map(t => s"$c (store: $t, batch: $got)")
    }
    require(mismatched.isEmpty,
      s"appended batch's payload type(s) conflict with the store at " +
      s"$path/cells: ${mismatched.mkString("; ")} — cells are read " +
      "without mergeSchema, so the store would become unreadable at " +
      "query time; cast the batch to the stored type(s)")
    (pay, layout.lifted)
  }

  /** Rewrite a persisted index into a fresh fully-compacted store at
    * `dest`: every cell collapses back to batch 0 with its rows co-located
    * in one shuffle partition — the maintenance pass that undoes the
    * small-files accumulation of daily [[append]]s (each append adds ≥1
    * file per touched cell; after a year that is 365 files per cell
    * directory, and open's file listing + scan pay for every one).
    * Writes to a NEW directory rather than in place: an in-place rewrite
    * is not atomic on object stores, so the swap belongs to the caller's
    * snapshot/publish step (see [[graft.pipeline.Snapshots]]). A
    * payload-partitioned layout carries through to the compacted store,
    * and the source's layout MANIFEST is copied verbatim when it carries
    * types: regenerating it from the re-opened store would re-derive
    * lifted-column types from partition-directory inference (a bigint
    * label read back as int), and later appends would then be rejected as
    * type conflicts.
    */
  def compactTo(spark: SparkSession, path: String, dest: String): Unit = {
    write(open(spark, path), dest, storedLayout(spark, path))
    copyLayoutManifest(spark, path, dest)
  }

  /** Overwrite `dest/layout` with `src/layout` when the source manifest
    * carries types (r12+ format) — see [[compactTo]].
    */
  private[operators] def copyLayoutManifest(spark: SparkSession,
      src: String, dest: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$src/layout")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) {
      val m = spark.read.parquet(s"$src/layout")
      if (m.schema.fieldNames.contains("ddl_type"))
        m.coalesce(1).write.mode("overwrite").parquet(s"$dest/layout")
    }
  }

  /** Per-cell population of an index — the drift/skew monitor [[append]]'s
    * no-retrain contract tells operators to watch: `(cell, n)` plus the
    * max/mean skew ratio broadcast onto every row. Rebuild when `skew`
    * says one probe does many cells' worth of work.
    */
  def cellStats(index: Index): DataFrame = {
    val counts = index.assigned.groupBy("cell").agg(count(lit(1)).as("n"))
    counts.crossJoin(broadcast(
        counts.agg((max("n") / avg("n")).as("skew"))))
      .orderBy("cell")
  }

  /** Argmin-distance cell id for one vector column; `centers(i)` must be
    * cell i's centroid. Centroids ride as a plan literal — the assignment
    * is a narrow, codegen-friendly pass.
    */
  private[operators] def assignCell(emb: Column, centers: Seq[Seq[Double]]): Column = {
    val cbLit = typedlit(centers)
    val dists = transform(cbLit, c =>
      aggregate(zip_with(transform(emb, _.cast("double")), c,
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

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

  /** Build the index: coarse centroids trained driver-side on up to
    * ~`trainSample` rows (sampled without a pre-count; the fit is plain
    * driver math via [[Lloyd]] — no distributed KMeans job round-trips)
    * + in-plan argmin cell assignment for every corpus vector (one narrow
    * pass, centroids ride as plan literals).
    *
    * Metric contract: cells partition RAW L2 space — training, assignment,
    * appends, and both query paths' probes all use raw vectors
    * consistently — while [[query]] RANKS by cosine. For a unit-norm
    * corpus the two agree exactly; for a corpus with varying norms the
    * cells additionally separate by magnitude, which costs recall at
    * small `nProbe` (direction-mates at different norms land in different
    * cells). Pre-normalize such a corpus before `build`/`append` when
    * cosine is the retrieval metric.
    */
  def build(corpus: DataFrame, nCells: Int, id: String = "vec_id",
            vec: String = "embedding", trainSample: Int = 100000,
            seed: Long = 42L, payload: Seq[String] = Nil): Index = {
    val spark = corpus.sparkSession
    // payload columns (labels, source tags, timestamps…) ride along into
    // the persisted cells, so filtered queries can push predicates into
    // the probed-cell parquet scan — the filtered-vector-search pattern
    val withVec = corpus.select(
      col(id).as("id") +: col(vec).as("emb") +: payload.map(col): _*)
    val sample = boundedSample(
        withVec.select(transform(col("emb"), _.cast("double")).as("v")),
        trainSample, seed)
      .collect().map(_.getSeq[Double](0).toArray)
    val centers = Lloyd.fit(sample, nCells, iters = 20, seed)
    val assigned = withVec.withColumn("cell",
      assignCell(col("emb"), centers.map(_.toSeq).toSeq))
    import spark.implicits._
    val centroids = centers.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toSeq) }
      .toDF("cell", "centroid")
    Index(centroids, assigned, nCells)
  }

  /** Per-query probed cells: `(q_id, q_emb, cell)`, `nProbe` rows per
    * query. Centroids broadcast; the nearest-cell ranking aggregates with
    * the `graft_kmin` k-capped heap — map-side partials collapse each
    * query's nCells scored rows to one heap row BEFORE the shuffle (vs the
    * old `row_number` window shuffling queries×nCells rows, then sorting).
    * Heap key `(cdist asc, cell asc)` matches the window's ordering.
    */
  private[operators] def probeCells(index: Index, q: DataFrame, nProbe: Int): DataFrame = {
    graft.GraftFunctions.register(q.sparkSession)
    q.crossJoin(broadcast(index.centroids))
      .select(col("q_id"), col("q_emb"), col("cell"),
        l2Distance(col("q_emb"), col("centroid")).as("cdist"))
      .groupBy("q_id")
      .agg(first(col("q_emb")).as("q_emb"),
        call_function("graft_kmin",
          struct(col("cdist").as("o"), col("cell")), lit(nProbe)).as("pc"))
      .select(col("q_id"), col("q_emb"), explode(col("pc.cell")).as("cell"))
  }

  /** Query: rank cells per query by centroid distance, keep `nProbe`,
    * then exact cosine top-k inside the probed cells only. Centroids are
    * tiny → broadcast; the candidate join shuffles on `cell`.
    *
    * `pruneCells` (default on) collects the distinct probed cell ids —
    * bounded by nCells, one small eager job of queries×centroids rows, the
    * same eager-at-construction shape as [[BloomPrune.mightJoin]] — and
    * filters `index.assigned` with a static `isin` BEFORE the candidate
    * join. On an [[open]]ed index `cell` is a partition column, so the
    * filter prunes whole cell directories at the parquet file listing: a
    * query plans ≈ nProbe/nCells of the index's files instead of all of
    * them. Final top-k aggregates with `graft_kmin` — the exchange carries
    * per-partition heaps (≤k entries) per query, never the scored
    * candidate set. Ordering matches
    * `row_number() over (order by sim desc, n_id asc)`.
    */
  /** `filter`: optional predicate over the index's payload columns (see
    * [[build]]'s `payload`) applied to candidates BEFORE scoring — filtered
    * vector search. Composes with cell pruning: the predicate lands in the
    * probed-cell parquet scan (PushedFilters), so a selective filter cuts
    * I/O, not just compute. Top-k is over the SURVIVORS, the standard
    * post-filter semantics (a very selective filter may return < k rows —
    * raise nProbe when filtered recall matters).
    */
  def query(index: Index, queries: DataFrame, k: Int, nProbe: Int,
            qId: String = "vec_id", qVec: String = "embedding",
            excludeSelf: Boolean = true, pruneCells: Boolean = true,
            filter: Option[Column] = None): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_emb"))
    // two consumers follow under pruneCells (the eager cell collect and
    // the candidate join), so the probe subplan runs twice — accepted:
    // it is queries x broadcast-centroids work, and an eager
    // localCheckpoint barrier here measured 2x SLOWER on the lifecycle
    // gate (r14: q93 3.1 -> 6.0 s isolated, reverted)
    val probes = probeCells(index, q, nProbe)
    val pruned =
      if (pruneCells) {
        // ≤ nCells values by construction — always collectable
        val cells = probes.select("cell").distinct().collect().map(_.getInt(0))
        index.assigned.where(col("cell").isin(cells.map(Integer.valueOf): _*))
      } else index.assigned
    val corpus = filter.map(pruned.where).getOrElse(pruned)
    val cand = probes.join(corpus, "cell")
      .where(if (excludeSelf) col("q_id") =!= col("id") else lit(true))
    val scored = cand.select(col("q_id"), col("id").as("n_id"),
      round(cosineFast(col("q_emb"), col("emb")), 6).as("sim"))
    val topk = scored.groupBy("q_id").agg(
      call_function("graft_kmin",
        struct((-col("sim")).as("o"), col("n_id"), col("sim")), lit(k)).as("tk"))
    topk.select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.n_id").as("n_id"), col("e.sim").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
