package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q164 oracle replays Spark's `xxhash64` (XXH64.hashLong, seed 42)
  * in DuckDB u64 arithmetic. The chain itself lives ONCE, as
  * [[OracleHashSql.XxLongSteps]]: the SQL generator and this spec's
  * reference evaluator ([[OracleHashSql.xxLongReference]]) both fold over
  * that step list, so primes, rotations, shift widths, and layer order
  * cannot drift apart (r18 advisory closed — previously this spec pinned
  * a hand-transcribed mirror, which a typo in the SQL literal generation
  * could silently pass). Pinning the shared chain against BOTH catalyst
  * XXH64 and the `xxhash64` Column function keeps the single source
  * itself honest.
  */
class XxHash64OracleSpec extends SparkSpec {
  import spark.implicits._

  private val U = BigInt(1) << 64

  private def chain(v: Long): BigInt = OracleHashSql.xxLongReference(v)

  private def toSigned(b: BigInt): Long =
    (if (b >= (BigInt(1) << 63)) b - U else b).toLong

  private val probes: Seq[Long] = Seq(0L, 1L, -1L, 42L, 499L,
    Long.MaxValue, Long.MinValue, 0x123456789abcdefL) ++
    (0 until 64).map(i => new java.util.Random(7L + i).nextLong())

  test("the u64 chain equals catalyst XXH64.hashLong(seed 42)") {
    probes.foreach { v =>
      val expected =
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, 42L)
      assert(toSigned(chain(v)) === expected, s"value $v")
    }
  }

  test("the u64 chain mod power-of-two equals Spark pmod(xxhash64, n)") {
    val got = probes.toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(64L)).as("b"))
      .as[(Long, Long)].collect().toMap
    probes.foreach { v =>
      assert((chain(v) % 64).toLong === got(v), s"value $v")
    }
  }
}
