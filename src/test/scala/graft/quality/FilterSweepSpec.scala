package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FilterSweepSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, 0.10, 100L), (2L, 0.25, 50L), (3L, 0.50, 10L),
    (4L, 0.50, 40L), (5L, 0.90, 200L), (6L, 0.05, 5L)
  ).toDF("doc_id", "score", "n_tok")

  test("sweep equals the per-threshold filter loop, in one pass") {
    val grid = (1 to 9).map(i => (i, i * 0.1))
    val got = FilterSweep.sweep(docs, col("score"), col("n_tok"), grid)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSeq
    val want = grid.map { case (i, th) =>
      val kept = docs.where(col("score") >= th)
      (i, kept.count(), kept.agg(sum("n_tok")).head.getLong(0))
    }
    // thresholds where nothing survives sum tokens to 0, not null
    val wantSafe = want.map { case (i, n, t) => (i, n, if (n == 0) 0L else t) }
    assert(got === wantSafe)
  }

  test("boundary semantics: metric == threshold is kept") {
    val out = FilterSweep.sweep(docs, col("score"), col("n_tok"),
      Seq((1, 0.5))).collect().head
    assert(out.getLong(2) === 3L) // 0.50, 0.50, 0.90
  }

  test("fractions are shares of the full corpus") {
    val out = FilterSweep.sweep(docs, col("score"), col("n_tok"),
      Seq((1, 0.3))).collect().head
    assert(out.getDouble(4) === 0.5)
    assert(out.getDouble(5) === 0.617284) // round(250/405, 6)
  }

  test("paddingSweep: exact ceil math, empty docs take no sequence") {
    val d = Seq(0L, 1L, 100L, 128L, 129L, 300L).toDF("n_tok")
    val r = graft.operators.Pack.paddingSweep(d, "n_tok", Seq(128))
      .collect().head
    // seqs: 0,1,1,1,2,3 = 8; pad: 0,127,28,0,127,84 = 366
    assert(r.getAs[Long]("n_seqs_padded") === 8L)
    assert(r.getAs[Long]("n_pad_tokens") === 366L)
    assert(r.getAs[Long]("n_tokens") === 658L)
    assert(r.getAs[Long]("n_seqs_concat") === 6L) // ceil(658/128)
    assert(r.getAs[Double]("pad_frac") === 0.357422) // round(366/1024, 6)
  }
}
