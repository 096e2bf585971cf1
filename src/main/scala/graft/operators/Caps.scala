package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The degeneracy cap shared by every candidate-pair path (LSH bands,
  * jaccard postings, simhash chunks, SemDedup cells, winnow fingerprints,
  * the band store): drop rows of groups larger than `max`.
  *
  * Deliberately a WINDOW count over the group keys, not a groupBy +
  * left-semi self-join: the window's hash exchange on the keys is the
  * single shared subtree every downstream consumer (typically a candidate
  * self-join on the same keys) then reuses — one shuffle, and the
  * upstream pass (signatures / normalize / fingerprints) is never
  * recomputed for a count side. Measured ~2x on the LSH family vs the
  * semi-join shape; caching variants (persist, localCheckpoint) measured
  * worse (DESIGN note 57).
  */
object Caps {
  def capGroupSize(df: DataFrame, max: Long, keys: String*): DataFrame = {
    require(keys.nonEmpty, "capGroupSize needs at least one key")
    require(!df.columns.contains("__n"),
      "input already has a __n column — capGroupSize would clobber it " +
      "(and count against the wrong frame); rename it first")
    df.withColumn("__n",
        count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .where(col("__n") <= max).drop("__n")
  }
}
