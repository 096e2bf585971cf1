package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Representation-boundary fuzz for the native expression layer — the
  * round-14 sweeps' lesson (UTF-16 code units vs code points, surrogate
  * pairs, locale-sensitive lowercasing) applied to text far outside the
  * ASCII testdata corpus: emoji (supplementary plane), CJK, combining
  * marks, dotted capital I (locale-trap lowercasing), NBSP (NOT \s
  * whitespace), fullwidth forms, and multi-space runs.
  *
  * Two kinds of pins. (1) The STRING-producing layer (shingles, gram
  * hashes) must equal the HOF formulation exactly — those strings are what
  * the DuckDB oracles tokenize, so a divergence here is a silent oracle
  * split. (2) The native HASH layers (graft_minhash / graft_simhash /
  * graft_hyperplane_lsh) are their own definition — deliberately DIFFERENT
  * hash families from the HOF demonstrations in TextFunctions/
  * VectorFunctions (Prof's speed rig is the only HOF caller), replayed in
  * SQL by [[OracleHashSql]] — so they are pinned by the invariances the
  * tokenize/lowercase boundary must give them, not by cross-family
  * equality.
  */
class NativeUnicodeFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  // words chosen to hit the known hazards; "a b" is ONE token (NBSP is
  // not regex \s), "İstanbul" lowercases differently under tr locale,
  // "🙂👍🏽" is all supplementary-plane + modifier
  private val words = Seq("the", "Élan", "牛肉面", "🙂👍🏽", "x", "ÜBER",
    "éclair", "a b", "ß1", "İstanbul", "ｆｕｌｌ", "𝕊𝕡𝕒𝕣𝕜")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 10)
    ws <- Gen.listOfN(n, Gen.oneOf(words))
    seps <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", " \t ", "\n"))
  } yield ws.zipAll(seps, "", "").flatMap { case (w, s) => Seq(w, s) }.mkString

  private def corpus(seed: Long) =
    sample(Gen.listOfN(40, textGen), seed).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("native shingles equal the HOF/oracle strings on hostile text") {
    (1L to 4L).foreach { seed =>
      val df = corpus(seed)
      val bad = df.select(
          shingleSet(col("text"), 2).as("sh_hof"),
          shingleSetFast(col("text"), 2).as("sh_fast"),
          wordShingles(col("text"), 3).as("sa_hof"),
          shinglesAllFast(col("text"), 3).as("sa_fast"))
        .where(!(col("sh_hof") <=> col("sh_fast")) ||
          !(col("sa_hof") <=> col("sa_fast")))
      assert(bad.count() === 0, s"seed=$seed: ${bad.collect().take(2).mkString("; ")}")
    }
  }

  test("minhash/simhash are pure functions of the token sequence/multiset on hostile text") {
    (1L to 4L).foreach { seed =>
      val df = corpus(seed)
      // whitespace-shape invariance: retokenize-and-rejoin with single
      // spaces must leave both hashes unchanged — separator shape is
      // exactly what the tokenize layer must erase. (Deliberately NOT
      // upper(): Unicode case folding is not a round trip — ß→SS→ss — so
      // case invariance only holds from the ORIGINAL text, which lower()
      // inside each path already applies.)
      val rejoined = concat_ws(" ", tokens(col("text")))
      val bad = df.select(
          minHashFast(col("text"), 2, 8).as("mh"),
          minHashFast(rejoined, 2, 8).as("mh2"),
          simHashFast(col("text")).as("si"),
          simHashFast(rejoined).as("si2"))
        .where(!(col("mh") <=> col("mh2")) || !(col("si") <=> col("si2")))
      assert(bad.count() === 0, s"seed=$seed whitespace/case invariance")
      // simhash is a multiset statistic: token order must not matter
      val badOrder = df.where(size(tokens(col("text"))) > 1).select(
          simHashFast(col("text")).as("si"),
          simHashFast(concat_ws(" ", reverse(tokens(col("text"))))).as("sir"))
        .where(!(col("si") <=> col("sir")))
      assert(badOrder.count() === 0, s"seed=$seed simhash order invariance")
    }
  }

  test("gram-hash count and distinctness line up with the string-gram path on hostile text") {
    (1L to 4L).foreach { seed =>
      val both = corpus(seed).select(
        shinglesAllFast(col("text"), 2).as("gs"),
        gramHashesFast(col("text"), 2).as("hs"))
      assert(both.where(size(col("gs")) =!= size(col("hs"))).count() === 0,
        s"seed=$seed gram/hash count mismatch")
      val pairs = both.select(explode(arrays_zip(col("gs"), col("hs"))).as("p"))
        .select(col("p.gs").as("g"), col("p.hs").as("h"))
      assert(pairs.groupBy("g").agg(countDistinct("h").as("n"))
        .where(col("n") =!= 1).count() === 0, s"seed=$seed one gram, two hashes")
    }
  }

  test("native hyperplane LSH is scale-invariant and seed-sensitive on random vectors") {
    val vecGen = Gen.listOfN(8, Gen.choose(-1000, 1000).map(_ / 100.0f))
    (1L to 4L).foreach { seed =>
      val vecs = sample(Gen.listOfN(30, vecGen), seed).zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }.toDF("id", "v")
      // positive scaling never moves a projection across the hyperplane —
      // the property that makes the signature a COSINE hash (norm must not
      // matter); a formulation hashing raw magnitudes would fail this
      val scaled = transform(col("v"), x => x * 7.5f)
      val bad = vecs.select(
          hyperplaneLshFast(col("v"), 16).as("a"),
          hyperplaneLshFast(scaled, 16).as("b"))
        .where(!(col("a") <=> col("b")))
      assert(bad.count() === 0, s"seed=$seed scale invariance")
      // different seeds give different hyperplane families (for banding)
      val allEqual = vecs.select(
          hyperplaneLshFast(col("v"), 16, seed = 1).as("a"),
          hyperplaneLshFast(col("v"), 16, seed = 2).as("b"))
        .where(col("a") === col("b")).count()
      assert(allEqual < 30, s"seed=$seed: seed-insensitive signatures")
    }
  }
}
