package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora at training-data scale.
  *
  * Design for 100 TB: every variant reduces to hash-partitioned shuffles on
  * compact keys (16-byte digests, 8-byte bucket ids) — never on the document
  * text itself — so shuffle volume is O(rows × key), not O(corpus bytes).
  * Candidate generation (LSH) is linear; only verification touches pairs, and
  * only pairs that collided in a bucket.
  */
object TextDedup {

  /** Exact dedup: group by content fingerprint, keep the lowest id.
    * One shuffle on the 128-bit digest. Returns the surviving rows.
    */
  def exact(df: DataFrame, idCol: String, textCol: String,
            normalized: Boolean = false): DataFrame = {
    val fp = if (normalized) fingerprint(col(textCol)) else md5(col(textCol))
    val keep = df.select(col(idCol), fp.as("__fp"))
      .groupBy("__fp").agg(min(idCol).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact-dup groups: fingerprint → (keeper id, group size). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Choose (bands, rowsPerBand) for [[minHashCandidates]] from a target
    * Jaccard threshold: over the factorizations b×r = numHashes, pick the
    * one whose S-curve inflection (1/b)^(1/r) is closest to the threshold
    * (the standard LSH tuning rule — Leskovec/Rajaraman/Ullman, MMDS §3.4).
    * Returns (numBands, rowsPerBand). Driver-side arithmetic only.
    */
  def tuneBands(threshold: Double, numHashes: Int): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    require(numHashes > 0, s"numHashes > 0: $numHashes")
    val options = for (r <- 1 to numHashes if numHashes % r == 0)
      yield (numHashes / r, r)
    options.minBy { case (b, r) =>
      math.abs(math.pow(1.0 / b, 1.0 / r) - threshold)
    }
  }

  /** MinHash-LSH candidate pairs: shingle → minhash signature → banded
    * buckets → self-join within buckets. Returns distinct (idA < idB) pairs.
    *
    * Scale: the explode produces rows×bands bucket rows; the self-join
    * shuffles on the 8-byte bucket hash. Giant buckets (degenerate content)
    * would quadratically blow up the join, so buckets above `maxBucketSize`
    * are dropped — at 100 TB this cap is what keeps the worst key from
    * dominating the stage (standard LSH practice; such buckets are
    * near-identical boilerplate best handled by exact dedup first).
    */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
                        maxBucketSize: Int = 1000): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      minHashFast(col(textCol), shingleN, numHashes).as("sig"))
      .where(col("sig").isNotNull)
    val buckets = sig.select(col("id"),
      posexplode(lshBuckets(col("sig"), rowsPerBand)).as(Seq("band", "bucket")))
    val bounded = Caps.capGroupSize(buckets, maxBucketSize, "band", "bucket")
    val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Verify candidate pairs with exact shingle-set Jaccard; keeps pairs with
    * similarity >= threshold. Joins the (small) candidate set back to the
    * corpus twice — each join is a shuffle on the id.
    *
    * `pruneToCandidates`: semi-join the corpus to the candidate id set
    * BEFORE shingling, so only docs that appear in some pair pay the
    * shingle explode. Right at 100 TB when candidates touch a small
    * fraction of a Zipfian corpus (high-threshold dedup); wrong when most
    * docs are candidates — measured on the dense synthetic sf0.1 corpus
    * with q85's 16 single-hash bands, the extra join costs ~1.7 s and
    * prunes almost nothing, hence default off and on at the caller's
    * discretion.
    */
  def jaccardVerify(candidates: DataFrame, df: DataFrame, idCol: String,
                    textCol: String, shingleN: Int, threshold: Double,
                    pruneToCandidates: Boolean = false): DataFrame = {
    val corpus = if (!pruneToCandidates) df else {
      val candidateIds = candidates.select(col("id_a").as("__jid"))
        .union(candidates.select(col("id_b").as("__jid")))
      df.join(candidateIds, df(idCol) === candidateIds("__jid"), "left_semi")
    }
    val sets = corpus.select(col(idCol).as("__jid"),
      shingleSetFast(col(textCol), shingleN).as("__set"))
    val joined = candidates
      .join(sets.withColumnRenamed("__jid", "id_a").withColumnRenamed("__set", "set_a"), "id_a")
      .join(sets.withColumnRenamed("__jid", "id_b").withColumnRenamed("__set", "set_b"), "id_b")
    val inter = size(array_intersect(col("set_a"), col("set_b"))).cast("double")
    val union = size(array_union(col("set_a"), col("set_b"))).cast("double")
    joined.select(col("id_a"), col("id_b"),
      when(union > 0, round(inter / union, 6)).otherwise(lit(0.0)).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** End-to-end MinHash near-dedup: LSH candidates + Jaccard verification. */
  def minHashNearDup(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
                     threshold: Double = 0.8): DataFrame =
    jaccardVerify(minHashCandidates(df, idCol, textCol, shingleN, numHashes, rowsPerBand),
      df, idCol, textCol, shingleN, threshold)

  /** All-pairs n-gram Jaccard via shingle inverted index (exact, no LSH):
    * explode distinct shingles, self-join on shingle to count intersections,
    * then derive the union from per-doc set sizes. Suited to moderate corpora
    * or post-LSH verification; the shingle join shuffles on the shingle hash.
    * Shingles shared by more than `maxPostings` docs are dropped from the
    * index (stopword-gram protection — same role as the LSH bucket cap).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.2,
                   maxPostings: Int = 10000): DataFrame = {
    // Carry each doc's set size through the explode instead of joining back
    // to a sizes table afterwards: the corpus is scanned for postings only
    // (plus the posting-cap count), and the final jaccard needs no extra
    // joins — sz_a/sz_b ride along as grouping keys (functionally dependent
    // on the ids). At scale this turns 5 corpus scans + 2 id-joins into 3
    // scans and 0 id-joins.
    val sets = df.select(col(idCol).as("id"), shingleSetFast(col(textCol), shingleN).as("set"))
      .where(size(col("set")) > 0)
    val postings = sets.select(col("id"), size(col("set")).as("sz"),
      explode(col("set")).as("shingle"))
    val bounded = Caps.capGroupSize(postings, maxPostings, "shingle")
    val a = bounded.select(col("shingle"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = bounded.select(col("shingle"), col("id").as("id_b"), col("sz").as("sz_b"))
    a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "sz_a", "id_b", "sz_b").agg(count(lit(1)).as("n_inter"))
      .select(col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_inter")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Cross-strata duplication matrix: for every unordered pair of strata
    * (sources, languages, snapshots), how many near-duplicate document
    * pairs straddle them — `(src_a, src_b, n_pairs, mean_jaccard)` with
    * `src_a <= src_b` (the diagonal counts within-stratum duplication).
    * The observability step before choosing which source to trust in a
    * mix: a web snapshot that heavily duplicates a curated source argues
    * for canonicalizing toward the curated copy, and a high diagonal
    * flags a source that needs within-source dedup first.
    *
    * Built on [[jaccardPairs]] (exact inverted-index Jaccard, posting-cap
    * bounded); the pair table is a sliver of the corpus, so the two
    * id→stratum joins are cheap and AQE broadcasts the pair side when it
    * fits. `mean_jaccard` is rounded from an exact decimal accumulation so
    * the result is aggregation-order-independent.
    */
  def crossStrataPairs(df: DataFrame, idCol: String, textCol: String,
                       strataCol: String, shingleN: Int = 3,
                       threshold: Double = 0.2,
                       maxPostings: Int = 10000): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, shingleN, threshold, maxPostings)
    val sa = df.select(col(idCol).as("id_a"), col(strataCol).as("__sa"))
    val sb = df.select(col(idCol).as("id_b"), col(strataCol).as("__sb"))
    pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .select(least(col("__sa"), col("__sb")).as("src_a"),
        greatest(col("__sa"), col("__sb")).as("src_b"), col("jaccard"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("jaccard").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_jaccard"))
  }

  /** Global segment-level exact dedup (C4-style boilerplate removal): split
    * each document into consecutive `segN`-token segments, keep only the
    * globally FIRST occurrence of each distinct segment (first by doc id,
    * then by position within the doc), and reassemble each document's
    * surviving text. Documents whose every segment was already seen
    * elsewhere drop out entirely; empty documents are dropped up front.
    *
    * Scale: segmentation is a narrow explode; the first-occurrence choice
    * is one `row_number` window hash-partitioned on `md5(segment)` — a
    * 128-bit digest, so the shuffle key is compact even for long segments
    * and hot boilerplate segments land in one partition where the window
    * scan is linear. Reassembly is one groupBy on the doc id. Segment text
    * crosses the wire once; raw document text never does.
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
                    segN: Int = 8): DataFrame = {
    // match on LOWERCASED segments, reassemble from CASE-PRESERVING ones
    // (same positions — lowercasing never moves whitespace): rebuilding
    // from the match-side tokens would silently case-fold every surviving
    // document, cf. SubstringDedup.cutSpans
    val segs = df
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__ts"),
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("__tr"))
      .where(size(col("__ts")) > 0)
      .select(col("__id"),
        posexplode(sequence(lit(0), size(col("__ts")) - 1, lit(segN)))
          .as(Seq("__seg_idx", "__start")),
        col("__ts"), col("__tr"))
      .select(col("__id"), col("__seg_idx"),
        array_join(slice(col("__ts"), col("__start") + 1, lit(segN)), " ").as("__seg"),
        array_join(slice(col("__tr"), col("__start") + 1, lit(segN)), " ").as("__seg_raw"))
    val firstSeen = Window.partitionBy(md5(col("__seg")))
      .orderBy(col("__id"), col("__seg_idx"))
    segs.withColumn("__rn", row_number().over(firstSeen))
      .where(col("__rn") === 1)
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("__seg_idx"), col("__seg_raw")))),
          x => x.getField("__seg_raw")), " ").as("kept_text"))
      .select(col("__id").as(idCol), col("n_kept"), col("kept_text"))
  }

  /** SimHash near-dup candidates: 64-bit signature, banded into 4×16-bit
    * chunks (pigeonhole: any pair within hamming distance 3 shares at least
    * one exact chunk), verified by full hamming distance <= maxHamming.
    */
  def simHashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHashFast(col(textCol)).as("sig"))
    val chunks = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("chunk_idx", "chunk")))
    val bounded = Caps.capGroupSize(chunks, maxBucketSize, "chunk_idx", "chunk")
    val a = bounded.select(col("chunk_idx"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = bounded.select(col("chunk_idx"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
