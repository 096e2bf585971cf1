package graft.operators

import graft.{GraftFunctions, SparkSpec, Tables}
import graft.expressions.{BloomSketch, CmsSketch}
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom filter never false-negatives and merges by OR") {
    val a = new BloomSketch(1024, 5)
    val b = new BloomSketch(1024, 5)
    (0L until 100L).foreach(i => a.add(CmsSketch.hashItem(i)))
    (100L until 200L).foreach(i => b.add(CmsSketch.hashItem(i)))
    a.merge(b)
    (0L until 200L).foreach(i =>
      assert(a.mightContain(CmsSketch.hashItem(i)), s"false negative for $i"))
    val back = BloomSketch.deserialize(a.serialize())
    (0L until 200L).foreach(i => assert(back.mightContain(CmsSketch.hashItem(i))))
    val e = intercept[IllegalArgumentException] { a.merge(new BloomSketch(2048, 5)) }
    assert(e.getMessage.contains("geometry"))
  }

  test("false-positive rate is near the design point") {
    // 1000 keys in 2^14 bits / 5 hashes → theoretical FP ≈ 0.2%
    val s = new BloomSketch(1 << 14, 5)
    (0L until 1000L).foreach(i => s.add(CmsSketch.hashItem(i)))
    val fp = (1000L until 21000L).count(i => s.mightContain(CmsSketch.hashItem(i)))
    assert(fp < 200, s"fp=$fp of 20000 (expected ~40)") // generous 1% ceiling
  }

  test("prunedJoin equals the plain join exactly") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.read(spark, dir, "orders")
      .where(col("o_totalprice") > 400000).select("o_orderkey", "o_orderstatus")
    val li = Tables.read(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val pruned = BloomPrune.prunedJoin(li, orders, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("mightJoin prunes the probe side hard for a selective build side") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.read(spark, dir, "orders").where(col("o_totalprice") > 400000)
    val li = Tables.read(spark, dir, "lineitem")
    val total = li.count()
    val kept = BloomPrune.mightJoin(li, orders, "l_orderkey", "o_orderkey").count()
    val trueMatches = li.join(orders.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi").count()
    assert(kept >= trueMatches, "bloom can never drop a true match")
    // selective build side → the filter should remove the vast majority
    assert(kept <= trueMatches + total / 50,
      s"kept=$kept trueMatches=$trueMatches total=$total — filter not selective")
  }

  test("an empty build side prunes every probe row") {
    GraftFunctions.register(spark)
    val probe = (1L to 100L).toDF("k")
    val build = Seq.empty[Long].toDF("bk")
    assert(BloomPrune.mightJoin(probe, build, "k", "bk").count() === 0L)
  }

  test("prunedAntiJoin equals the plain left-anti join on a composite key") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.read(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    // composite-key tombstones: ~2% of (orderkey, linenumber) pairs
    val dead = li.where(pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(50)) === 0)
      .select("l_orderkey", "l_linenumber")
    val keys = Seq("l_orderkey", "l_linenumber")
    val pruned = BloomPrune.prunedAntiJoin(li, dead, keys)
    val plain = li.join(dead, keys, "left_anti")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("prunedAntiJoin survives int-vs-bigint key type drift") {
    // same logical keys, different physical types: the plain anti join
    // coerces and removes them; the bloom digest must agree or tombstoned
    // rows silently survive (xxhash64 is input-type-sensitive)
    val big = spark.range(1, 1001)
      .select(col("id").cast("int").as("k"), (col("id") * 2).as("v"))
    val dead = Seq(5L, 10L, 500L).toDF("k") // bigint tombstones
    val pruned = BloomPrune.prunedAntiJoin(big, dead, Seq("k"))
    val plain = big.join(dead, Seq("k"), "left_anti")
    assert(plain.count() === 997L)
    assert(pruned.count() === 997L)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("prunedAntiJoin survives string-vs-bigint keys with non-canonical strings") {
    // comparison coercion casts the STRING side to bigint ('05' → 5), so the
    // plain anti join matches; a string-widening digest would hash '5' vs
    // '05' and false-negative. The digest must use the join's own coercion.
    val big = spark.range(1, 1001).select(col("id").as("k"), (col("id") * 2).as("v"))
    val dead = Seq("05", " 5", "500").toDF("k") // → tombstoned keys {5, 500}
    val plain = big.join(dead, Seq("k"), "left_anti")
    val pruned = BloomPrune.prunedAntiJoin(big, dead, Seq("k"))
    assert(plain.count() === 998L)
    assert(pruned.count() === 998L)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("prunedAntiJoin with empty tombstones keeps every row without joining") {
    val probe = (1L to 1000L).toDF("k")
    val dead = Seq.empty[Long].toDF("k")
    assert(BloomPrune.prunedAntiJoin(probe, dead, Seq("k")).count() === 1000L)
  }
}
