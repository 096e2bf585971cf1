package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins functions.Rounding.round6's tie rule on the exact values that
  * split Spark round from DuckDB round at sf0.1 (DESIGN note 75).
  */
class RoundingSpec extends SparkSpec {
  import spark.implicits._

  test("round6: IEEE floor form, half-toward-+inf, stable on the note-75 ties") {
    // (input, expected): -121943034/1e6/36 is doc 10's exact micro
    // half-tie (-3387306.5); Spark round() gave -3.387307 (string-repr
    // HALF_UP), DuckDB -3.387306 — round6 must give the floor-form answer
    val cases = Seq(
      (-121943034.0 / 1e6 / 36, -3.387306),
      (-266322771.0 / 1e6 / 78, -3.414394), // doc 1986's tie
      (0.7 * 0.123455, 0.086419),           // 7th-digit-5 weighted tie
      (1.2345675, 1.234568),                // positive half-tie rounds up
      (-1.2345675, -1.234567),              // negative: toward +inf
      (0.1234561, 0.123456),
      (2.0, 2.0))
    val got = cases.map(_._1).toDF("x")
      .select(graft.functions.Rounding.round6(col("x"))).as[Double].collect()
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((e, g), i) =>
      assert(g === e, s"case $i: ${cases(i)._1}")
    }
    // and the rule is what the Scala floor form computes — the same
    // formula a SQL oracle replays as FLOOR(x*1e6+0.5)/1e6
    cases.map(_._1).foreach { x =>
      val ref = math.floor(x * 1e6 + 0.5) / 1e6
      val g = Seq(x).toDF("x")
        .select(graft.functions.Rounding.round6(col("x"))).as[Double].head()
      assert(g === ref, s"x=$x")
    }
  }
}
