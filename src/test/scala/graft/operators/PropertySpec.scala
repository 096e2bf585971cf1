package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import scala.jdk.CollectionConverters._

/** ScalaCheck-generator-driven properties promised in SURVEY §5:
  * Relationalize preserves row multiplicity and parent-key coverage; dedup
  * is idempotent with unique output keys. (Seeded sampling — no
  * scalatestplus bridge needed.)
  */
class PropertySpec extends SparkSpec {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("xs", ArrayType(IntegerType)),
    StructField("obj", StructType(Seq(StructField("a", StringType))))))

  private val rowGen: Gen[(Seq[Int], String)] = for {
    n <- Gen.choose(0, 5)
    xs <- Gen.listOfN(n, Gen.choose(-100, 100))
    a <- Gen.alphaStr.map(_.take(4))
  } yield (xs, a)

  test("relationalize: element multiplicity and parent-key coverage hold") {
    (1L to 5L).foreach { seed =>
      val rows = sample(Gen.listOfN(10, rowGen), seed)
        .zipWithIndex.map { case ((xs, a), i) => (s"id$i", xs, a) }
      val df = spark.createDataFrame(
        rows.map { case (id, xs, a) => Row(id, xs, Row(a)): Row }.asJava, schema)
      val tables = Relationalize(df, "t", Seq("id"))
      val parent = tables("t")
      val child = tables("t_xs")
      assert(parent.count() === rows.size)
      assert(parent.columns.contains("obj_a"))
      val totalElems = rows.map(_._2.size).sum
      assert(child.where("xs_val IS NOT NULL").count() === totalElems)
      // every parent key appears in the child (outer explode keeps empties)
      assert(child.select("id").distinct().count() === rows.size)
    }
  }

  test("dedup: idempotent, unique keys, keeps max-ordered row per key") {
    import spark.implicits._
    val rowG = for {
      k <- Gen.choose(1, 5).map(_.toString)
      d <- Gen.choose(1, 28)
    } yield (k, f"2023-05-$d%02dT00:00:00")
    (1L to 5L).foreach { seed =>
      val rows = sample(Gen.listOfN(30, rowG), seed)
      val df = rows.toDF("GlobalKey", "export_end_date")
      val out = DedupLatest.latestExport(df, Seq("GlobalKey"))
      val collected = out.as[(String, String)].collect()
      assert(collected.map(_._1).distinct.length === collected.length)
      val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(collected.toMap === expected)
      assert(DedupLatest.latestExport(out.toDF(), Seq("GlobalKey")).count() ===
        collected.length)
    }
  }
}
