package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val orders = (1 to 200).map(i => (i.toLong, s"o$i")).toDF("k", "ov")
    val items = (1 to 600).map(i => (((i % 200) + 1).toLong, s"i$i")).toDF("k", "iv")
    Bucketing.writeBucketed(orders, "b_orders", Seq("k"), 4, sortCols = Seq("k"))
    Bucketing.writeBucketed(items, "b_items", Seq("k"), 4, sortCols = Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "b_orders")
        .join(Bucketing.table(spark, "b_items"), "k")
      assert(joined.count() === 600)
      assert(Bucketing.isExchangeFree(joined),
        "bucketed join should not shuffle:\n" + joined.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted dedup equals plain dedup under a totally-ordered key") {
    val rows = (1 to 500).map { i =>
      val key = if (i % 5 == 0) "hot" else s"k${i % 37}"
      (key, f"2023-05-${(i % 28) + 1}%02dT00:00:00", i.toLong)
    }
    val df = rows.toDF("GlobalKey", "export_end_date", "seq")
    val ordering = Seq(col("export_end_date").desc, col("seq").desc)
    val plain = DedupLatest(df, Seq("GlobalKey"), ordering)
      .select("GlobalKey", "seq").as[(String, Long)].collect().toMap
    val salted = DedupLatest.salted(df, Seq("GlobalKey"), ordering, saltBuckets = 8)
      .select("GlobalKey", "seq").as[(String, Long)].collect().toMap
    assert(salted === plain)
  }
}
