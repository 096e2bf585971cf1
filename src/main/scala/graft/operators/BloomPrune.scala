package graft.operators

import graft.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a Bloom filter of the BUILD side's keys
  * (one narrow aggregation), broadcast its bytes, and drop probe rows whose
  * key cannot match BEFORE the probe side shuffles. The manual, composable
  * form of runtime row-level filtering (cf. Spark's
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, which only fires
  * under specific plan shapes): at 100 TB the win is that non-matching
  * probe rows never leave their input partition — with a selective build
  * side, shuffle volume drops to ≈ the matching fraction plus the false-
  * positive rate.
  *
  * `mightJoin` alone can keep false positives (rate ≈ (1−e^(−kn/m))^k);
  * compose with the real join ([[prunedJoin]]) for exact results — the
  * filter can never drop a true match (no false negatives).
  */
object BloomPrune {

  /** Probe rows whose `probeKey` might appear among `build`'s `buildKey`s.
    * Default geometry: 2²³ bits (1 MiB) / 5 hashes ≈ 1% FP at 1M build keys.
    *
    * NOTE: the Bloom build runs a Spark job at plan-CONSTRUCTION time (the
    * `.head` below) — the same eager shape as Spark's own runtime filters.
    * Don't construct-and-discard these plans in a loop; build once, reuse.
    *
    * The bloom is computed EAGERLY (one job over the build side) and
    * embedded as a literal — the same shape as Spark's own runtime filters,
    * which inject the built filter as a plan-time scalar. Embedding matters:
    * read as a broadcast-joined COLUMN instead, every row access copies the
    * binary out of its UnsafeRow, so the per-task deserialization memo in
    * `graft_bloom_contains` (which keys on array identity) never hits and
    * the filter re-parses 1 MiB per probe row; a literal hands every row
    * the same array instance. Measured: 313 s → sub-second on a 600k-row
    * probe at the default geometry.
    */
  def mightJoin(probe: DataFrame, build: DataFrame,
                probeKey: String, buildKey: String,
                numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    GraftFunctions.register(probe.sparkSession)
    val bloomBytes = build.agg(call_function("graft_bloom_agg",
        col(buildKey), lit(numBits), lit(numHashes)).as("__bloom"))
      .head.getAs[Array[Byte]](0)
    probe.where(call_function("graft_bloom_contains", lit(bloomBytes), col(probeKey)))
  }

  /** Exact inner equi-join with the probe side Bloom-pruned first: the
    * filter passes every true match (no false negatives) and the join then
    * eliminates the false positives, so the result equals
    * `probe.join(build, probe(probeKey) === build(buildKey))` exactly —
    * with the big side's shuffle shrunk to the surviving rows.
    */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    val pruned = mightJoin(probe, build, probeKey, buildKey, numBits, numHashes)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }

  /** Exact left-anti join (tombstone subtraction) with the big side Bloom-
    * split first. Rows whose key tuple is NOT in the Bloom of `small`'s keys
    * provably have no match — they bypass the join entirely and never leave
    * their input partition. Only the Bloom-POSITIVE rows (true matches plus
    * the false-positive fraction) enter the anti join, which then removes
    * the survivors among them. Result equals `big.join(small, keys,
    * "left_anti")` exactly: no false negatives means every truly-matched row
    * is in the maybe-set, and false positives are cleared by the real join.
    *
    * At 100 TB with a tombstone table touching ~0.1% of keys, the anti
    * join's shuffle drops from the whole table to ≈ 0.1% + FP-rate of it;
    * the definitely-kept union branch is a narrow scan. Multi-column keys
    * are folded through `xxhash64` on both sides (a 64-bit key digest —
    * xxhash64 collisions only cost an extra row through the exact join).
    */
  def prunedAntiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    require(keys.nonEmpty, "prunedAntiJoin requires key columns")
    GraftFunctions.register(big.sparkSession)
    // xxhash64 is input-TYPE-sensitive: the same logical key as int on one
    // side and bigint on the other hashes differently, the bloom reports
    // "definitely absent", and truly-tombstoned rows would silently bypass
    // the anti join (the join itself coerces and WOULD have matched them).
    // Normalize both sides' key columns to the same widened type Spark's
    // own equality coercion would pick before computing the digest, so
    // digest equality tracks join equality. The types come from ANALYZING
    // the actual join (below) — whatever coercion rule set the session
    // runs (ANSI or legacy), the digest cast is the analyzer's cast by
    // construction, not a re-implementation that could drift.
    val analyzed = analyzedKeyTypes(big, small, keys)
    val types = keys.map { k =>
      analyzed.getOrElse(k,
        commonKeyType(k, big.schema(k).dataType, small.schema(k).dataType))
    }
    def digest(side: DataFrame) = xxhash64(
      keys.zip(types).map { case (k, t) => side(k).cast(t) }: _*)
    val bloomBytes = small
      .agg(call_function("graft_bloom_agg", digest(small),
        lit(numBits), lit(numHashes)).as("__bloom"))
      .head.getAs[Array[Byte]](0)
    val maybe = call_function("graft_bloom_contains", lit(bloomBytes), digest(big))
    big.where(!maybe).unionByName(
      big.where(maybe).join(small.select(keys.head, keys.tail: _*), keys, "left_anti"))
  }

  /** The post-coercion type of each key in the ACTUAL anti join's analyzed
    * equality condition — the ground truth the digest cast must follow: if
    * the digest coerces differently from the join, digest equality stops
    * tracking join equality and the bloom can report definitely-absent for
    * a truly-matched row (a silent false negative — e.g. bigint `5` vs
    * string `'05'`: the join casts the string to bigint and matches, but a
    * string-widening digest would hash `'5'` vs `'05'`). Analyzing the real
    * join makes the cast correct under BOTH ANSI (Spark 4 default) and
    * legacy coercion, and stays correct across Spark upgrades. Analysis
    * only — no job runs. Keys the walk cannot find (unexpected plan shape)
    * fall back to [[commonKeyType]].
    */
  private def analyzedKeyTypes(big: DataFrame, small: DataFrame, keys: Seq[String])
      : Map[String, org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val resolver = big.sparkSession.sessionState.analyzer.resolver
    val plan = big.join(small.select(keys.head, keys.tail: _*), keys, "left_anti")
      .queryExecution.analyzed
    def eqs(e: Expression): Seq[EqualTo] = e match {
      case eq: EqualTo => Seq(eq)
      case other => other.children.flatMap(eqs)
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case c: Cast => nameOf(c.child)
      case _ => None
    }
    val conds = plan.collect { case j: Join => j }
      .flatMap(_.condition.toSeq.flatMap(eqs))
    keys.flatMap { k =>
      conds.collectFirst {
        // post-coercion, both sides of the EqualTo carry the same dataType
        case eq if nameOf(eq.left).exists(resolver(_, k)) => k -> eq.left.dataType
      }
    }.toMap
  }

  /** Fallback when [[analyzedKeyTypes]] cannot find a key (it re-implements
    * what the analyzer does in the common cases):
    * `findCommonTypeForBinaryComparison` first — comparison coercion, where
    * string-vs-atomic resolves to the NON-string type — then
    * `findWiderTypeForTwo` for the non-string pairs it leaves to the generic
    * rules (numeric widening, where ANSI and legacy coercion agree).
    * Distinct values colliding after a lossy widening (two huge bigints
    * meeting in double) merely add false positives, which the exact join
    * clears.
    */
  private def commonKeyType(key: String,
                            a: org.apache.spark.sql.types.DataType,
                            b: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType =
    if (a == b) a
    else org.apache.spark.sql.catalyst.analysis.TypeCoercion
      .findCommonTypeForBinaryComparison(a, b,
        org.apache.spark.sql.internal.SQLConf.get)
      .orElse(org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findWiderTypeForTwo(a, b))
      .getOrElse(throw new IllegalArgumentException(
        s"prunedAntiJoin: key '$key' has incompatible types on the two sides ($a vs $b)"))
}
