package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  // The classic Fleiss worked example: 10 subjects, 14 raters, 5
  // categories; published values P̄ ≈ 0.378, P_e ≈ 0.213, κ ≈ 0.210.
  private val fleissTable: Seq[Seq[Int]] = Seq(
    Seq(0, 0, 0, 0, 14),
    Seq(0, 2, 6, 4, 2),
    Seq(0, 0, 3, 5, 6),
    Seq(0, 3, 9, 2, 0),
    Seq(2, 2, 8, 1, 1),
    Seq(7, 7, 0, 0, 0),
    Seq(3, 2, 6, 3, 0),
    Seq(2, 5, 3, 2, 2),
    Seq(6, 5, 2, 1, 0),
    Seq(0, 2, 2, 3, 7))

  private def expand(table: Seq[Seq[Int]]) =
    table.zipWithIndex.flatMap { case (row, item) =>
      row.zipWithIndex.flatMap { case (nij, label) =>
        Seq.fill(nij)((item.toLong, s"cat$label"))
      }
    }.toDF("item", "label")

  test("the Fleiss 1971 worked example reproduces the published numbers") {
    val row = Agreement.fleiss(expand(fleissTable), "item", "label")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(row._1 === 10L)   // items
    assert(row._2 === 140L)  // ratings
    assert(row._3 === 5L)    // labels
    assert(math.abs(row._4 - 0.378) < 0.002, s"p_bar ${row._4}")
    assert(math.abs(row._5 - 0.213) < 0.002, s"p_e ${row._5}")
    assert(math.abs(row._6 - 0.210) < 0.002, s"kappa ${row._6}")
  }

  test("perfect agreement gives kappa = 1, per-item P_i = 1") {
    val d = (1 to 20).flatMap(i => Seq.fill(4)((i.toLong, s"only${i % 3}")))
      .toDF("item", "label")
    val row = Agreement.fleiss(d, "item", "label")
      .select("p_bar", "kappa").as[(Double, Double)].collect().head
    assert(row._1 === 1.0)
    assert(row._2 === 1.0)
    val pis = Agreement.fleissPerItem(d, "item", "label")
      .select("p_i").as[Double].collect()
    assert(pis.forall(_ === 1.0))
  }

  test("items below minRatings are excluded from items AND marginals") {
    val d = (Seq.fill(5)((1L, "a")) ++ Seq((2L, "b"))).toDF("item", "label")
    val row = Agreement.fleiss(d, "item", "label")
      .as[(Long, Long, Long, Double, Double, Option[Double])].collect().head
    // item 2 (one rating) drops entirely: 1 item, 5 ratings, 1 label —
    // its 'b' label never reaches the marginals; with one label p_e = 1
    // and κ is undefined (null), not an ANSI divide-by-zero
    assert(row._1 === 1L && row._2 === 5L && row._3 === 1L)
    assert(row._5 === 1.0 && row._6.isEmpty)
  }

  test("null labels and null items are missing ratings, never categories") {
    // grouped as a category, two raters skipping the same item would
    // "agree on null" and inflate P-bar; a null item cannot be scored —
    // both must fold to exactly the non-null subset's statistics
    val clean = (Seq.fill(3)((1L, "a")) ++ Seq((1L, "b")) ++
      Seq.fill(4)((2L, "b"))).toDF("item", "label")
    val dirty = (Seq.fill(3)((Option(1L), Option("a"))) ++
      Seq((Option(1L), Option("b"))) ++
      Seq.fill(4)((Option(2L), Option("b"))) ++
      Seq((Option(1L), Option.empty[String]),          // missing rating
          (Option.empty[Long], Option("a")),           // unkeyed rating
          (Option.empty[Long], Option.empty[String]))) // both
      .toDF("item", "label")
    val a = Agreement.fleiss(clean, "item", "label").collect().toSeq
    val b = Agreement.fleiss(dirty, "item", "label").collect().toSeq
    assert(a === b)
    val pa = Agreement.fleissPerItem(clean, "item", "label")
      .orderBy("item").collect().toSeq
    val pb = Agreement.fleissPerItem(dirty, "item", "label")
      .orderBy("item").collect().toSeq
    assert(pa === pb)
  }

  test("matches a plain-Scala reference with identical quantization (randomized)") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val nItems = 5 + rnd.nextInt(20)
      val labels = Seq("x", "y", "z").take(2 + rnd.nextInt(2))
      val rows = (0 until nItems).flatMap { i =>
        val n = 2 + rnd.nextInt(9)
        Seq.fill(n)((i.toLong, labels(rnd.nextInt(labels.size))))
      }
      val got = Agreement.fleiss(rows.toDF("item", "label"), "item", "label")
        .as[(Long, Long, Long, Double, Double, Double)].collect().head
      // reference: same micro-quantized folds, plain Scala
      val byItem = rows.groupBy(_._1).values.toSeq
      val pim = byItem.map { rs =>
        val n = rs.size.toLong
        val ss = rs.groupBy(_._2).values.map(g => g.size.toLong * g.size).sum
        math.round((ss - n).toDouble / (n * (n - 1)).toDouble * 1e6)
      }
      val tt = rows.size.toLong
      val pem = rows.groupBy(_._2).values.map { g =>
        val pj = g.size.toLong.toDouble / tt.toDouble
        math.round(pj * pj * 1e12)
      }.sum
      val pBar = pim.sum.toDouble / 1e6 / byItem.size
      val pE = pem.toDouble / 1e12
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got._1 === byItem.size.toLong, s"trial $trial items")
      assert(got._2 === tt, s"trial $trial ratings")
      assert(got._4 === r6(pBar), s"trial $trial p_bar")
      assert(got._5 === r6(pE), s"trial $trial p_e")
      assert(got._6 === r6((pBar - pE) / (1.0 - pE)), s"trial $trial kappa")
    }
  }
}
