package graft.expressions

import graft.{GraftFunctions, SparkSpec}
import org.apache.spark.sql.functions._

class CmsQuantizeRepetitionSpec extends SparkSpec {
  import spark.implicits._

  // --- count-min sketch ---

  test("cms estimates are exact overestimates within the 2n/width bound") {
    val s = new CmsSketch(5, 1024)
    // zipf-ish: item i occurs (1000 / (i+1)) times
    val truth = (0 until 200).map(i => i.toLong -> (1000 / (i + 1)).toLong).toMap
    truth.foreach { case (item, n) => s.add(CmsSketch.hashItem(item), n) }
    val total = truth.values.sum
    truth.foreach { case (item, n) =>
      val est = s.estimate(CmsSketch.hashItem(item))
      assert(est >= n, s"cms must never underestimate (item $item)")
      assert(est - n <= 2 * total / 1024 + 1, s"item $item err=${est - n}")
    }
  }

  test("cms merge equals the sketch of the concatenated stream, exactly") {
    val a = new CmsSketch(4, 256)
    val b = new CmsSketch(4, 256)
    val whole = new CmsSketch(4, 256)
    (0 until 500).foreach { i =>
      val h = CmsSketch.hashItem(i.toLong % 37)
      (if (i % 2 == 0) a else b).add(h)
      whole.add(h)
    }
    a.merge(b)
    assert(a.serialize().toSeq === whole.serialize().toSeq)
  }

  test("cms rejects geometry mismatches and round-trips serialization") {
    val a = new CmsSketch(4, 256)
    a.add(CmsSketch.hashItem("x"))
    val back = CmsSketch.deserialize(a.serialize())
    assert(back.estimate(CmsSketch.hashItem("x")) === 1L)
    val e = intercept[IllegalArgumentException] { a.merge(new CmsSketch(4, 512)) }
    assert(e.getMessage.contains("geometry"))
  }

  test("cms SQL surface: store daily sketches, merge, point-query") {
    GraftFunctions.register(spark)
    val df = (0 until 5000).map(i => (i % 7, (i % 23).toLong)).toDF("day", "item")
      .repartition(8)
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_store_").toString
    df.groupBy("day")
      .agg(call_function("graft_cms_sketch", col("item"), lit(5), lit(512)).as("sk"))
      .write.parquet(s"$tmp/daily")
    val est = spark.read.parquet(s"$tmp/daily")
      .agg(call_function("graft_cms_merge", col("sk")).as("sk"))
      .select(call_function("graft_cms_value", col("sk"), lit(3L)).as("est"))
      .as[Long].head()
    val exact = 5000 / 23 + (if (3 < 5000 % 23) 1 else 0)
    assert(est >= exact && est - exact <= 2 * 5000 / 512 + 1)
    // int and long probes hash identically (hash by value)
    val estInt = spark.read.parquet(s"$tmp/daily")
      .agg(call_function("graft_cms_merge", col("sk")).as("sk"))
      .select(call_function("graft_cms_value", col("sk"), lit(3)).as("est"))
      .as[Long].head()
    assert(estInt === est)
  }

  // --- int8 quantization ---

  test("quantize8 maps max|x| to ±127 and bounds dequantization error") {
    GraftFunctions.register(spark)
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(3.0f, 3.0f, -3.0f, 1.5f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector
    val out = vecs.toDF("id", "v")
      .select(col("id"), call_function("graft_quantize8", col("v")).as("z"))
      .select(col("id"), col("z.scale"), col("z.q"))
      .as[(Long, Double, Seq[Int])].collect().sortBy(_._1)
    val (_, s1, q1) = out(0)
    assert(q1 === Seq(64, -127, 32, 0))
    assert(math.abs(s1 - 1.0 / 127.0) < 1e-15)
    // every element reconstructs within half a quantization step
    vecs(0)._2.zip(q1).foreach { case (x, q) =>
      assert(math.abs(q * s1 - x) <= s1 / 2 + 1e-12)
    }
    val (_, s3, q3) = out(2)
    assert(s3 === 0.0 && q3 === Seq(0, 0, 0, 0))
  }

  test("dot_q8 is the exact integer dot product; length mismatch fails") {
    GraftFunctions.register(spark)
    val out = Seq((Array(127, -128, 64, 1), Array(2, 3, -4, 100)))
      .toDF("a", "b")
      .select(call_function("graft_dot_q8", col("a"), col("b")).as("d"))
      .as[Long].head()
    assert(out === 127L * 2 - 128L * 3 - 64L * 4 + 100L)
    val e = intercept[Exception] {
      Seq((Array(1, 2), Array(1, 2, 3))).toDF("a", "b")
        .select(call_function("graft_dot_q8", col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("quantized ranking agrees with exact cosine ranking on well-separated vectors") {
    GraftFunctions.register(spark)
    // two well-separated directions: quantization must not reorder the gap
    val near = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val far = Array.tabulate(16)(i => math.cos(i + 1).toFloat) // ~orthogonal direction
    def jitter(b: Array[Float], seed: Int): Array[Float] =
      b.zipWithIndex.map { case (x, i) => x + 0.01f * math.sin(seed * 31 + i).toFloat }
    val corpus = (1 to 20).map(i => (i.toLong, jitter(if (i <= 10) near else far, i)))
    val df = corpus.toDF("id", "v")
      .select(col("id"), call_function("graft_quantize8", col("v")).as("z"))
    val probe = df.where(col("id") === 1)
      .select(col("z.q").as("pq")).as[Seq[Int]].head()
    val ranked = df.select(col("id"),
        call_function("graft_dot_q8", typedLit(probe), col("z.q")).as("d"))
      .where(col("id") =!= 1)
      .orderBy(col("d").desc, col("id").asc)
      .select("id").as[Long].collect()
    // the 9 tight-jitter vectors (2..10) must all rank above the 10 far ones
    assert(ranked.take(9).toSet === (2L to 10L).toSet)
  }

  // --- repetition stats ---

  test("repetition stats match hand-computed fractions") {
    GraftFunctions.register(spark)
    val out = Seq(
      ("a b a b a", 1L),        // 2-grams: ab,ba,ab,ba → top2=2/4; 3-grams: aba,bab,aba → dup3=1/3
      ("x y z w", 2L),          // all distinct → top2=1/3, dup3=0/2
      ("hello", 3L),            // too short for any n-gram → 0, 0
      ("go go go go", 4L))      // 2-grams: all "go go" → top2=3/3=1; 3-grams: 2 dup of 1 → 1/2
      .toDF("text", "id")
      .select(col("id"), call_function("graft_repetition", col("text")).as("r"))
      .select(col("id"), col("r.top2_frac"), col("r.dup3_frac"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 0.5, 1.0 / 3)))
    assert(out(1) === ((2L, 1.0 / 3, 0.0)))
    assert(out(2) === ((3L, 0.0, 0.0)))
    assert(out(3) === ((4L, 1.0, 0.5)))
  }

  // --- text normalization ---

  test("normalize folds case, accents, unicode forms, and whitespace") {
    GraftFunctions.register(spark)
    val composed = "Café  NAÏVE" // é, Ï precomposed
    val decomposed = "Café \t NAÏVE\n" // e+combining acute, I+diaeresis
    val out = Seq((1L, composed), (2L, decomposed), (3L, "  plain   text  "))
      .toDF("id", "t")
      .select(col("id"), call_function("graft_normalize", col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "cafe naive")
    assert(out(2L) === "cafe naive") // decomposed input normalizes identically
    assert(out(3L) === "plain text")
  }

  test("normalize makes composed/decomposed duplicates hash-equal for dedup") {
    GraftFunctions.register(spark)
    val hashes = Seq("résumé text", "résumé text")
      .toDF("t")
      .select(md5(call_function("graft_normalize", col("t")).cast("binary")).as("h"))
      .as[String].collect()
    assert(hashes.distinct.length === 1)
  }

  test("repetition is case-insensitive and whitespace-tolerant like the tokenizer") {
    GraftFunctions.register(spark)
    val Seq(a, b) = Seq("Spark  SPARK\tspark spark", "spark spark spark spark")
      .toDF("text")
      .select(call_function("graft_repetition", col("text")).as("r"))
      .select(col("r.top2_frac"), col("r.dup3_frac"))
      .as[(Double, Double)].collect().toSeq
    assert(a === b)
  }
}
