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
    spark.stop()
  }
}
