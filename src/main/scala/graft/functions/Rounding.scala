package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic display rounding.
  *
  * Spark's `round(x, 6)` on a double goes through
  * `BigDecimal.valueOf(x)` — i.e. HALF_UP on the SHORTEST DECIMAL
  * REPRESENTATION of the double — while DuckDB rounds the exact binary
  * value with double arithmetic. The two agree almost everywhere but split
  * exactly when the value's true decimal expansion sits ON a 6-decimal
  * half-tie: Spark's string path reconstructs the tie (".…5") and rounds
  * away, DuckDB sees the nearest double (a hair below the tie) and rounds
  * down. Ties are not rare in this engine's outputs — a mean of exact
  * micro-units `S/1e6/n` is a half-tie whenever `n` divides `2S` but not
  * `S` (~1/2n of documents), and weighted 6-decimal scores (`0.7 × k/1e6`)
  * tie at every 7th-digit 5 — found by running the full oracle compare at
  * sf0.1, where q90/q94/q95/q100 each flipped a handful of rows that the
  * sf0.01 driver gate happened not to sample.
  *
  * [[round6]] sidesteps the implementation split: `floor(x·1e6 + 0.5)/1e6`
  * uses only IEEE-exact operations (multiply, add, floor, divide — all
  * correctly rounded and identically defined in every engine), so given
  * bit-identical input doubles the result is bit-identical EVERYWHERE, at
  * any scale factor. The tie rule becomes half-toward-+∞ in double space.
  * Mirror it in oracle SQL as `FLOOR(x * 1e6 + 0.5) / 1e6` — change both
  * sides together.
  */
object Rounding {
  def round6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
}
