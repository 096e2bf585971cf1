package graft.expressions

import graft.{GraftFunctions, SparkSpec}
import org.apache.spark.sql.functions._

class KllSpec extends SparkSpec {
  import spark.implicits._

  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  // deterministic skewed data: heavy head, long tail
  private def data(n: Int): Array[Double] =
    Array.tabulate(n)(i => math.pow(1.0 + (i * 2654435761L % n).toDouble / n, 8))

  test("sketch quantiles stay within 2% rank error on skewed data") {
    val xs = data(100000)
    val s = new KllSketch(200)
    xs.foreach(s.update)
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val r = rankOf(sorted, s.quantile(q))
      assert(math.abs(r - q) <= 0.02, s"q=$q rank=$r")
    }
  }

  test("merging partitioned sketches matches single-pass accuracy") {
    val xs = data(60000)
    val whole = new KllSketch(200)
    xs.foreach(whole.update)
    val merged = xs.grouped(7000).map { chunk =>
      val s = new KllSketch(200); chunk.foreach(s.update); s
    }.reduce { (a, b) => a.merge(b); a }
    assert(merged.count === whole.count)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(rankOf(sorted, merged.quantile(q)) - q) <= 0.02)
    }
  }

  test("merging sketches with different k downgrades to min(k), order-independent") {
    val xs = data(40000)
    def build(k: Int, slice: Array[Double]): KllSketch = {
      val s = new KllSketch(k); slice.foreach(s.update); s
    }
    val (lo, hi) = xs.splitAt(20000)
    val ab = build(200, lo); ab.merge(build(50, hi))
    val ba = build(50, hi); ba.merge(build(200, lo))
    assert(ab.k === 50 && ba.k === 50, "merged capacity must be the weaker input's")
    assert(ab.count === xs.length && ba.count === xs.length)
    // both orders must satisfy the WEAKER sketch's error bound
    val sorted = xs.sorted
    for (s <- Seq(ab, ba); q <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(rankOf(sorted, s.quantile(q)) - q) <= 0.05)
    }
  }

  test("serialization round-trips the sketch") {
    val s = new KllSketch(64)
    data(5000).foreach(s.update)
    val back = KllSketch.deserialize(s.serialize())
    assert(back.count === s.count)
    for (q <- Seq(0.1, 0.5, 0.9)) assert(back.quantile(q) === s.quantile(q))
  }

  test("stored daily sketches re-aggregate to week-level quantiles") {
    GraftFunctions.register(spark)
    // 7 "days" x 8000 values; daily sketches persisted to parquet, then a
    // second query merges the STORED bytes — no raw row is ever re-read
    val n = 56000
    val df = (0 until n).map(i => (i % 7, data(n)(i))).toDF("day", "x")
    val tmp = java.nio.file.Files.createTempDirectory("graft_kll_store_").toString
    df.groupBy("day")
      .agg(call_function("graft_kll_sketch", col("x"), lit(200)).as("sk"))
      .write.parquet(s"$tmp/daily")

    val weekly = spark.read.parquet(s"$tmp/daily")
      .agg(call_function("graft_kll_merge", col("sk")).as("wk"))
      .select(
        call_function("graft_kll_value", col("wk"), lit(0.1)).as("p10"),
        call_function("graft_kll_value", col("wk"), lit(0.5)).as("p50"),
        call_function("graft_kll_value", col("wk"), lit(0.9)).as("p90"))
      .as[(Double, Double, Double)].collect().head

    val sorted = data(n).sorted
    for ((q, v) <- Seq(0.1 -> weekly._1, 0.5 -> weekly._2, 0.9 -> weekly._3)) {
      val r = rankOf(sorted, v)
      assert(math.abs(r - q) <= 0.02, s"q=$q rank=$r after store+merge")
    }
  }

  test("aggregate works through a real grouped shuffle, ignoring nulls") {
    GraftFunctions.register(spark)
    val n = 20000
    val df = (0 until n).map { i =>
      (if (i % 2 == 0) "a" else "b", if (i % 97 == 0) None else Some(i.toDouble))
    }.toDF("g", "x").repartition(8)
    val out = df.groupBy("g")
      .agg(call_function("graft_kll_quantiles", col("x"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(200)).as("qs"))
      .as[(String, Seq[Double])].collect().toMap
    for (g <- Seq("a", "b"); (q, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
      val approx = out(g)(i)
      // values are 0..n uniform per group: value-space rank ≈ value/n
      assert(math.abs(approx / n - q) <= 0.03, s"g=$g q=$q got=$approx")
    }
    // empty group -> null
    val empty = Seq(("a", Option.empty[Double])).toDF("g", "x")
      .groupBy("g").agg(call_function("graft_kll_quantiles", col("x"),
        array(lit(0.5)), lit(64)).as("qs"))
      .select("qs").collect().head
    assert(empty.isNullAt(0))
  }
}
