package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q164 oracle replays Spark's `xxhash64` (XXH64.hashLong, seed 42)
  * in DuckDB u64 arithmetic. This spec mirrors the exact SQL formula
  * sequence (mod-2^64 multiply, disjoint-range rotl, xor via signed
  * round-trip, floor-div shifts) in BigInt and pins it against BOTH
  * Spark's catalyst XXH64 and the `xxhash64` Column function, so a
  * drifted prime, rotation, or layer order in [[OracleHashSql]] fails
  * here instead of (only) at the driver's DuckDB compare.
  */
class XxHash64OracleSpec extends SparkSpec {
  import spark.implicits._

  private val U = BigInt(1) << 64

  private def u64(x: Long): BigInt = {
    val b = BigInt(x); if (x < 0) b + U else b
  }

  private def mul(a: BigInt, b: BigInt): BigInt = (a * b) % U
  private def xr(a: BigInt, b: BigInt): BigInt = a ^ b // both < 2^64
  private def rotl(c: BigInt, r: Int): BigInt =
    mul(c, BigInt(1) << r) + c / (BigInt(1) << (64 - r))

  /** The 11 SQL layers of OracleHashSql.xxhash64LongCtes, verbatim. */
  private def chain(v: Long): BigInt = {
    val p1 = u64(0x9E3779B185EBCA87L); val p2 = u64(0xC2B2AE3D27D4EB4FL)
    val p3 = u64(0x165667B19E3779F9L); val p4 = u64(0x85EBCA77C2B2AE63L)
    val h0 = u64(42L + 0x27D4EB2F165667C5L + 8L)
    var c = u64(v)
    c = mul(c, p2) //  1
    c = rotl(c, 31) //  2
    c = mul(c, p1) //  3
    c = xr(h0, c) //  4
    c = rotl(c, 27) //  5
    c = (mul(c, p1) + p4) % U //  6
    c = xr(c, c / (BigInt(1) << 33)) //  7
    c = mul(c, p2) //  8
    c = xr(c, c / (BigInt(1) << 29)) //  9
    c = mul(c, p3) // 10
    c = xr(c, c / (BigInt(1) << 32)) // 11
    c
  }

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
