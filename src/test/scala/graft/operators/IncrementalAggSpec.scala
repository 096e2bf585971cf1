package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def dec(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("v", col("v").cast("decimal(18,4)"))

  test("maintained aggregate equals a from-scratch recompute") {
    // base: 100 rows, groups g0..g4 by id % 5
    val base = dec((0L until 100L).map(i => (i, s"g${i % 5}", i * 1.5 + 0.25))
      .toDF("id", "g", "v"))
    // delta: replace ids 0-9 (some move groups!), delete 10-19, insert 100-109
    val replaces = dec((0L until 10L).map(i => (i, s"g${(i + 1) % 5}", 1000.0 + i))
      .toDF("id", "g", "v")).withColumn("__deleted", lit(false))
    val deletes = (10L until 20L).map(i => (i, Option.empty[String], Option.empty[Double]))
      .toDF("id", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
      .withColumn("__deleted", lit(true))
    val inserts = dec((100L until 110L).map(i => (i, s"g${i % 5}", i * 2.0))
      .toDF("id", "g", "v")).withColumn("__deleted", lit(false))
    val changes = replaces.unionByName(deletes).unionByName(inserts)

    val maintained = IncrementalAgg.maintain(
      IncrementalAgg.full(base, Seq("g"), "v"), base, changes,
      idKeys = Seq("id"), groupKeys = Seq("g"), valueCol = "v")

    // apply the merge by hand and recompute
    val applied = base.join(changes.select("id"), Seq("id"), "left_anti")
      .unionByName(changes.where(!col("__deleted")).drop("__deleted"))
    val recomputed = IncrementalAgg.full(applied, Seq("g"), "v")

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("g"), col("n"), col("total").cast("decimal(28,4)"))
        .as[(String, Long, BigDecimal)].collect().toSet
    assert(norm(maintained) === norm(recomputed))
  }

  test("chained maintenance over many batches never drifts from recompute") {
    // the materialized-view scenario: apply 4 successive deltas, carrying
    // the maintained aggregate forward each time; after every batch it must
    // equal a from-scratch recompute of the evolving base (decimal = exact,
    // so equality is bit-for-bit, not approximate)
    var base = dec((0L until 60L).map(i => (i, s"g${i % 3}", i * 0.7 + 0.1))
      .toDF("id", "g", "v"))
    var agg = IncrementalAgg.full(base, Seq("g"), "v")
    for (batch <- 1 to 4) {
      val lo = batch * 7L
      val replaces = dec((lo until lo + 5L).map(i => (i, s"g${(i + batch) % 3}", i * 1.1))
        .toDF("id", "g", "v")).withColumn("__deleted", lit(false))
      val deletes = (lo + 5L until lo + 8L).map(i => (i, Option.empty[String], Option.empty[Double]))
        .toDF("id", "g", "v").withColumn("v", col("v").cast("decimal(18,4)"))
        .withColumn("__deleted", lit(true))
      val inserts = dec(Seq((1000L + batch, s"g${batch % 3}", 42.0 + batch))
        .toDF("id", "g", "v")).withColumn("__deleted", lit(false))
      val changes = replaces.unionByName(deletes).unionByName(inserts)

      agg = IncrementalAgg.maintain(agg, base, changes, Seq("id"), Seq("g"), "v")
      base = base.join(changes.select("id"), Seq("id"), "left_anti")
        .unionByName(changes.where(!col("__deleted")).drop("__deleted"))

      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select(col("g"), col("n"), col("total").cast("decimal(28,4)"))
          .as[(String, Long, BigDecimal)].collect().toSet
      assert(norm(agg) === norm(IncrementalAgg.full(base, Seq("g"), "v")),
        s"drift after batch $batch")
    }
  }

  test("a group emptied by deletes disappears; a new group appears") {
    val base = dec(Seq((1L, "only", 5.0), (2L, "keep", 7.0)).toDF("id", "g", "v"))
    val changes = Seq((1L, Option.empty[String], Option.empty[Double], true),
        (3L, Some("fresh"), Some(9.0), false))
      .toDF("id", "g", "v", "__deleted")
      .withColumn("v", col("v").cast("decimal(18,4)"))
    val out = IncrementalAgg.maintain(
        IncrementalAgg.full(base, Seq("g"), "v"), base, changes,
        Seq("id"), Seq("g"), "v")
      .select(col("g"), col("n"), col("total").cast("double"))
      .as[(String, Long, Double)].collect()
      .map { case (g, n, t) => g -> ((n, t)) }.toMap
    assert(out === Map("keep" -> ((1L, 7.0)), "fresh" -> ((1L, 9.0))))
  }
}
