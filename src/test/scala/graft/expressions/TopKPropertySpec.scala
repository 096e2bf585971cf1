package graft.expressions

import graft.{GraftFunctions, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the k-capped heap aggregate `graft_kmin` — it now
  * carries knn ranking (q25/q26/q38) and stratified sampling (q55), so its
  * generic-ordering semantics get seeded random coverage beyond the
  * hand-picked cases: for any data, group layout, and k, the result equals
  * sort-take-k under the same ordering.
  */
class TopKPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val rowGen: Gen[(Int, Double, Long)] = for {
    g <- Gen.choose(0, 4)
    // duplicate-heavy doubles exercise tie-breaks through the struct tail
    v <- Gen.oneOf(Gen.choose(-5, 5).map(_.toDouble), Gen.choose(-1e9, 1e9).map(_ / 1e3))
    id <- Gen.choose(0L, 30L)
  } yield (g, v, id)

  test("graft_kmin over (v, id) structs equals sort-take-k, any seed/k/partitioning") {
    GraftFunctions.register(spark)
    for (seed <- 1L to 8L) {
      val rows = sample(Gen.listOfN(200, rowGen), seed)
      val k = 1 + (seed % 5).toInt
      val nPart = 1 + (seed % 4).toInt
      val df = rows.toDF("g", "v", "id").repartition(nPart)
      val got = df.groupBy("g")
        .agg(call_function("graft_kmin", struct($"v", $"id"), lit(k)).as("tk"))
        .select($"g", posexplode($"tk").as(Seq("pos", "e")))
        .select($"g", $"pos", $"e.v", $"e.id")
        .as[(Int, Int, Double, Long)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(r => (r._2, r._3)).sorted.take(k).zipWithIndex
          .map { case ((v, id), pos) => (g, pos, v, id) }
      }.toSet
      assert(got === want, s"seed=$seed k=$k parts=$nPart")
    }
  }

  test("nulls are ignored; group of only nulls yields an empty array") {
    GraftFunctions.register(spark)
    val df = Seq((1, Some(3.0)), (1, None), (2, None)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(call_function("graft_kmin", $"v", lit(2)).as("tk"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(out(1) === Seq(3.0))
    assert(out(2) === Seq.empty)
  }

  test("a struct with a null primary sort key is ignored, not ranked first") {
    // struct ordering sorts nulls FIRST: without the null-sort-key skip, a
    // null-scored row (a zero vector's null cosine) tops every ANN heap
    GraftFunctions.register(spark)
    val df = Seq((1, Some(5.0), 10L), (1, None, 11L), (1, Some(3.0), 12L),
        (1, None, 13L))
      .toDF("g", "v", "id")
    val out = df.groupBy("g")
      .agg(call_function("graft_kmin", struct($"v", $"id"), lit(3)).as("tk"))
      .select(posexplode($"tk").as(Seq("pos", "e")))
      .select($"e.id").as[Long].collect().toSeq
    assert(out === Seq(12L, 10L),
      s"null-keyed rows must be ignored like null values, got ids $out")
  }
}
