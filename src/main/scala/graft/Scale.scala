package graft
import org.apache.spark.sql.functions._
import graft.operators._
object Scale {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(16)
    val d1 = Tables.read(spark, "/root/testdata/sf0.1", "documents")
    // 16x corpus: shifted ids, text perturbed per replica to avoid trivial exact dups
    val d16 = (0 until 16).map(i =>
      d1.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))).reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n%d t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    time("warmup")(d16.count())
    time("exact_1x")(TextDedup.exactGroups(d1, "doc_id", "text").count())
    time("exact_16x")(TextDedup.exactGroups(d16, "doc_id", "text").count())
    time("minhash_1x")(TextDedup.minHashCandidates(d1, "doc_id", "text").count())
    time("minhash_16x")(TextDedup.minHashCandidates(d16, "doc_id", "text").count())
    time("jaccard_1x")(TextDedup.jaccardPairs(d1, "doc_id", "text", 4, 0.01).count())
    time("jaccard_16x")(TextDedup.jaccardPairs(d16, "doc_id", "text", 4, 0.01).count())
    val e1 = Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    val e8 = (0 until 8).map(i => e1.select((col("vec_id") + lit(i * 1000000)).as("vec_id"),
      col("embedding"), col("label"))).reduce(_ union _)
    time("neardup_1x")(Knn.cosineNearDup(e1, 0.3).count())
    time("neardup_8x")(Knn.cosineNearDup(e8, 0.3).count())
    // temporal operators: replicate events 16x across disjoint users — asof
    // (window) and band join (bucket equi join) must both scale linearly
    val ev1 = Tables.read(spark, "/root/testdata/sf0.1", "events")
    val ev16 = (0 until 16).map(i =>
      ev1.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * 100000L)).as("user_id"),
        col("event_type"), col("value"))).reduce(_ union _)
    def asofCount(ev: org.apache.spark.sql.DataFrame): Long = {
      val l = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("lts"))
      val r = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("rts")).agg(max("value").as("v"))
      AsOfJoin.latestPrior(l, r, Seq("user_id"), "lts", "rts").count()
    }
    def bandCount(ev: org.apache.spark.sql.DataFrame): Long = {
      val a = ev.where(col("event_type") === "click")
        .select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
      val b = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("b_id"), col("user_id"), col("ts").as("b_ts"))
      BandJoin.within(a, b, Seq("user_id"), "a_ts", "b_ts", 3600L * 1000000000L).count()
    }
    time("asof_1x")(asofCount(ev1))
    time("asof_16x")(asofCount(ev16))
    time("band_1x")(bandCount(ev1))
    time("band_16x")(bandCount(ev16))
    spark.stop()
  }
}
