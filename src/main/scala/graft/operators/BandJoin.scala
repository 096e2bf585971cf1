package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: all pairs `(a, b)` sharing `keys` with
  * `|a.ts - b.ts| <= width` — proximity matching over event streams (e.g.
  * click↔purchase attribution within an hour) without a cartesian or an
  * un-plannable theta join.
  *
  * Spark-first plan: both sides bucket their timestamp by `width`; a pair
  * within `width` can only differ by at most one bucket, so side `a` is
  * expanded to its 3 candidate buckets and equi-joined on `(keys, bucket)`,
  * then the exact band predicate filters false candidates. The 3× explode
  * carries ALL of `a`'s columns — pass the narrower side (or a pre-projected
  * `a` plus a post-join lookup) as `a` when columns are wide; the explode
  * multiplies `a`'s full shuffle volume. Each qualifying pair
  * appears exactly once because `b` keeps its single true bucket. The join
  * is a plain equi shuffle join — broadcast-able when one side is small,
  * AQE-skew-splittable, prunable — instead of the BroadcastNestedLoopJoin
  * Spark would pick for the raw inequality predicate.
  *
  * Inputs must have disjoint non-key column names (project/alias first);
  * timestamps are numeric (e.g. epoch nanos), `width` inclusive.
  */
object BandJoin {

  def within(a: DataFrame, b: DataFrame, keys: Seq[String],
             aTs: String, bTs: String, width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val overlap = a.columns.filterNot(keys.contains)
      .intersect(b.columns.filterNot(keys.contains))
    require(overlap.isEmpty, s"non-key columns collide: ${overlap.mkString(",")}")

    // exact integer floor-bucket via `div` — a double division of raw int64
    // nanos (~1.7e18 > 2^53) would round by ~128 ns and drop true pairs at
    // bucket boundaries ((ts - pmod) is an exact multiple, so truncating
    // `div` equals floor for either sign)
    val bucket = (ts: String) =>
      expr(s"(`$ts` - pmod(`$ts`, ${width}L)) div ${width}L")
    val aExp = a.withColumn("__bucket",
      explode(array(bucket(aTs) - 1, bucket(aTs), bucket(aTs) + 1)))
    val bExp = b.withColumn("__bucket", bucket(bTs))

    aExp.join(bExp, keys :+ "__bucket")
      .where(abs(col(aTs) - col(bTs)) <= width)
      .drop("__bucket")
  }

  /** [[within]] for a WIDE `a` side: only `(keys, aId, aTs)` ride the 3×
    * bucket explode; `a`'s remaining payload is attached to the (typically
    * far smaller) matched pairs by one extra equi join on `aId`. Trades 3×
    * the full `a` shuffle for 3× a three-column projection + 1× `a` — the
    * right shape when `a` carries fat payloads (documents, embeddings).
    * `aId` must uniquely identify `a`'s rows. Output columns match
    * [[within]]: all of `a`, then `b`'s non-key columns.
    */
  def withinNarrow(a: DataFrame, b: DataFrame, keys: Seq[String],
                   aTs: String, bTs: String, width: Long,
                   aId: String): DataFrame = {
    require(a.columns.contains(aId), s"aId column $aId not in a")
    // within() only sees the slim projection — enforce its disjointness
    // contract against the FULL a here, or a payload/b name collision
    // surfaces later as an ambiguous-reference analysis error
    val overlap = a.columns.filterNot(keys.contains)
      .intersect(b.columns.filterNot(keys.contains))
    require(overlap.isEmpty, s"non-key columns collide: ${overlap.mkString(",")}")
    val slimCols = (keys :+ aId :+ aTs).distinct
    val matches = within(a.select(slimCols.map(col): _*), b, keys, aTs, bTs, width)
    val payload = a.columns.filterNot(c => slimCols.contains(c))
    val joined =
      if (payload.isEmpty) matches
      else matches.join(a.select((aId +: payload).map(col): _*), Seq(aId))
    joined.select((a.columns ++ b.columns.filterNot(keys.contains)).map(col): _*)
  }
}
