package graft.expressions

import graft.SparkSpec
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** The native STRING-producing expressions (shingles, gram hashes) must
  * agree with their HOF "executable specification" counterparts — and
  * thereby with the DuckDB oracle SQL that tokenizes the same strings. The
  * native HASH layers (graft_minhash / graft_simhash /
  * graft_hyperplane_lsh) are their own definition, replayed in SQL by
  * [[OracleHashSql]]; the same-purpose HOF compositions in
  * TextFunctions/VectorFunctions are deliberately different hash families
  * (Prof's speed rig is their only caller) — see NativeUnicodeFuzzSpec for
  * the invariances that pin them instead.
  */
class NativeConsistencySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.read(spark, "/root/testdata/sf0.001", "documents").limit(100)

  test("native shingles == HOF shingle set, elementwise") {
    val diff = docs.select(
      shingleSet(col("text"), 3).as("hof"),
      shingleSetFast(col("text"), 3).as("fast"))
      .where(not(col("hof") === col("fast")))
    assert(diff.count() === 0)
    // non-distinct variant preserves multiplicity and order
    val diff2 = docs.select(
      wordShingles(col("text"), 4).as("hof"),
      shinglesAllFast(col("text"), 4).as("fast"))
      .where(not(col("hof") === col("fast")))
    assert(diff2.count() === 0)
  }

  test("gram hashes: positional alignment, injectivity on real grams, edge cases") {
    // window COUNT and POSITIONS must line up with the string-gram path,
    // and distinct gram strings must map to distinct hashes on the corpus
    val both = docs.select(col("doc_id"),
        shinglesAllFast(col("text"), 5).as("gs"),
        gramHashesFast(col("text"), 5).as("hs"))
    assert(both.where(size(col("gs")) =!= size(col("hs"))).count() === 0)
    // equal gram strings <=> equal hashes, across the whole corpus
    val pairs = both.select(explode(arrays_zip(col("gs"), col("hs"))).as("p"))
      .select(col("p.gs").as("g"), col("p.hs").as("h"))
    assert(pairs.groupBy("g").agg(countDistinct("h").as("n"))
      .where(col("n") =!= 1).count() === 0, "one gram, two hashes")
    assert(pairs.groupBy("h").agg(countDistinct("g").as("n"))
      .where(col("n") =!= 1).count() === 0, "hash collision on real grams")
    // short docs produce empty arrays
    val short = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
      .select(gramHashesFast(col("text"), 3).as("hs"))
    assert(short.where(size(col("hs")) =!= 0).count() === 0)
  }

  test("native cosine == HOF cosine within double rounding") {
    val e = Tables.read(spark, "/root/testdata/sf0.001", "embeddings").limit(30)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).where(col("ia") < col("ib"))
    val bad = pairs.select(
      cosine(col("va"), col("vb")).as("hof"),
      cosineFast(col("va"), col("vb")).as("fast"))
      .where(abs(col("hof") - col("fast")) > 1e-12)
    assert(bad.count() === 0)
  }

  test("graft_* functions are callable from SQL after registration") {
    val r = spark.sql(
      """SELECT graft_simhash('the quick brown fox') AS sh,
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  size(graft_shingles('a b c d', 2)) AS ns""".stripMargin).collect().head
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[Int]("ns") === 3)
    assert(r.getAs[Long]("sh") != 0L)
  }

  test("round-3 aggregates and scalars are callable from SQL") {
    Seq((1, 5.0), (1, 1.0), (1, 3.0), (2, 8.0))
      .toDF("g", "x").createOrReplaceTempView("__nc_vals")
    val rows = spark.sql(
      """SELECT g,
        |  graft_kmin(x, 2) AS k2,
        |  graft_kll_quantiles(x, array(0.5D), 64) AS med,
        |  graft_kll_value(graft_kll_sketch(x, 64), 0.5D) AS med2,
        |  graft_bucket(max(x), array(2.0D, 4.0D, 6.0D)) AS b
        |FROM __nc_vals GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0).getAs[Seq[Double]]("k2") === Seq(1.0, 3.0))
    assert(rows(0).getAs[Seq[Double]]("med") === Seq(3.0))
    assert(rows(0).getAs[Double]("med2") === 3.0)
    assert(rows(0).getAs[Int]("b") === 2) // max=5.0: boundaries 2,4 <= 5
    assert(rows(1).getAs[Seq[Double]]("k2") === Seq(8.0))
    assert(rows(1).getAs[Int]("b") === 3)
    // merge path from SQL too: sketches of the two groups unioned
    val merged = spark.sql(
      """SELECT graft_kll_value(graft_kll_merge(sk), 1.0D) AS hi FROM (
        |  SELECT g, graft_kll_sketch(x, 64) AS sk FROM __nc_vals GROUP BY g)""".stripMargin)
      .collect().head
    assert(merged.getAs[Double]("hi") === 8.0)
  }

  test("round-4 aggregates and scalars are callable from SQL") {
    Seq((1, 10L, "a b a b"), (1, 10L, "x"), (2, 20L, "y"))
      .toDF("g", "k", "t").createOrReplaceTempView("__nc_r4")
    val r = spark.sql(
      """SELECT graft_cms_value(sk, 10L) AS c10,
        |  graft_bloom_contains(bl, 10L) AS has10,
        |  graft_bloom_contains(bl, 999L) AS has999
        |FROM (SELECT graft_cms_sketch(k, 5, 512) AS sk,
        |             graft_bloom_agg(k, 1024, 5) AS bl FROM __nc_r4)""".stripMargin)
      .collect().head
    assert(r.getAs[Long]("c10") >= 2L)
    assert(r.getAs[Boolean]("has10"))
    assert(!r.getAs[Boolean]("has999"))
    // merge path from SQL too: per-group sketches unioned
    val m = spark.sql(
      """SELECT graft_cms_value(graft_cms_merge(sk), 20L) AS c20 FROM (
        |  SELECT g, graft_cms_sketch(k, 5, 512) AS sk FROM __nc_r4 GROUP BY g)""".stripMargin)
      .collect().head
    assert(m.getAs[Long]("c20") >= 1L)
    val r2 = spark.sql(
      """SELECT graft_normalize('  Crème   BRÛLÉE ') AS n,
        |  graft_repetition('a b a b a').top2_frac AS t2,
        |  graft_quantize8(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))).q AS q,
        |  graft_dot_q8(array(2, 3), array(4, 5)) AS d""".stripMargin).collect().head
    assert(r2.getAs[String]("n") === "creme brulee")
    assert(r2.getAs[Double]("t2") === 0.5)
    assert(r2.getAs[Seq[Int]]("q") === Seq(127, -63)) // floor(-63.5 + 0.5)
    assert(r2.getAs[Long]("d") === 23L)
  }

  test("wrong argument types fail at analysis, not execution") {
    // long literal where int is expected, and non-array args to vector math
    for (bad <- Seq(
        "SELECT graft_shingles(text, 3L) FROM __nc_docs",
        "SELECT graft_minhash(text, 3, '16') FROM __nc_docs",
        "SELECT graft_simhash(42)",
        "SELECT graft_dot('a', 'b')",
        "SELECT graft_cosine(array(1.0D), 7)",
        "SELECT graft_l2norm('nope')",
        "SELECT graft_hyperplane_lsh(array(1.0D), 16L, 42)")) {
      docs.createOrReplaceTempView("__nc_docs")
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad).collect())
      assert(e.getMessage.toLowerCase.contains("expects"), s"for: $bad → ${e.getMessage}")
    }
  }

  test("minhash-merge aggregate equals the signature of the concatenated group") {
    val parts = Seq(
      ("g", "the quick brown fox jumps over"),
      ("g", "a lazy dog sleeps near the river"),
      ("g", "shingle sets union under minimum hashing"))
      .toDF("grp", "text")
    val merged = parts.groupBy("grp")
      .agg(expr("graft_minhash_merge(graft_minhash(text, 2, 16))").as("sig"))
      .select("sig").as[Seq[Long]].collect().head
    val whole = Seq(parts.select("text").as[String].collect().mkString(" | "))
      .toDF("text")
      // signature of the union of the three shingle sets: compute per part
      // and take elementwise min manually
    val sigs = parts.select(minHashFast(col("text"), 2, 16).as("s"))
      .as[Seq[Long]].collect()
    val expected = sigs.reduce((a, b) => a.zip(b).map { case (x, y) => math.min(x, y) })
    assert(merged === expected)
    val _ = whole
  }

  test("edge cases: empty text, short docs, empty vectors") {
    val edge = Seq("", "one", "one two", "  spaced   out  ").toDF("text")
    val rows = edge.select(
      shingleSetFast(col("text"), 3).as("sh"),
      minHashFast(col("text"), 3, 8).as("mh"),
      simHashFast(col("text")).as("simh")).collect()
    assert(rows(0).getSeq[String](0).isEmpty && rows(0).isNullAt(1))
    assert(rows(1).getSeq[String](0).isEmpty && rows(1).isNullAt(1))
    assert(rows(2).getSeq[String](0).isEmpty && rows(2).isNullAt(1)) // 2 tokens < n
    assert(rows(3).getSeq[String](0).isEmpty && rows(3).isNullAt(1)) // whitespace runs collapse
    val _ = rows.map(_.getLong(2)) // simhash defined for all inputs
  }
}
