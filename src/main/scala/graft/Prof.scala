package graft
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(32)
    val d = Tables.read(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROF $name = $r in ${(System.nanoTime()-t0)/1e9}s")
    }
    time("warmup count")(d.count())
    time("tokens sum")(d.select(sum(size(tokens(col("text"))))).head())
    time("shingleSet sum")(d.select(sum(size(shingleSet(col("text"), 4)))).head())
    time("shingleSet x2")(d.select(sum(size(shingleSet(col("text"), 4)))).head())
    time("minhash16")(d.select(sum(size(minHashSignature(shingleSet(col("text"),3),16)))).head())
    time("explode count")(d.select(col("doc_id"), explode(shingleSet(col("text"),4)).as("s")).count())
    val e = Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    time("emb count")(e.count())
    import graft.functions.VectorFunctions._
    time("normalize sum")(e.select(sum(size(normalize(col("embedding"))))).head())
    time("hyperlsh16")(e.select(sum(hyperplaneLsh(col("embedding"),16))).head())
    // bm25 stage anatomy (q74 at sf0.1)
    val qs = d.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ", slice(tokens(col("text")), 1, 8)).as("q_text"))
    time("bm25 qterms")(qs.select(explode(tokens(col("q_text")))).distinct().count())
    time("bm25 explode+count")(d.select(col("doc_id"),
      explode(tokens(col("text"))).as("term")).count())
    time("bm25 full 1st")(graft.operators.Bm25.topK(d, "doc_id", "text", qs,
      "q_id", "q_text", k = 5).count())
    time("bm25 full 2nd")(graft.operators.Bm25.topK(d, "doc_id", "text", qs,
      "q_id", "q_text", k = 5).count())
    time("bm25 full 3rd")(graft.operators.Bm25.topK(d, "doc_id", "text", qs,
      "q_id", "q_text", k = 5).count())
    // bm25 internals
    import graft.operators.Bm25
    val toksDf = d.select(col("doc_id"), shinglesAllFast(col("text"), 1).as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("doc_id"), size(col("ts")).as("dl"), explode(col("ts")).as("term"))
    val qt = qs.select(col("q_id"), explode(tokens(col("q_text"))).as("term"))
    time("bm25 stats")(d.select(size(shinglesAllFast(col("text"), 1)).as("dl"))
      .where(col("dl") > 0).agg(count(lit(1)), sum("dl")).count())
    time("bm25 ptoks")(toksDf.join(broadcast(qt.select("term").distinct()), Seq("term")).count())
    time("bm25 postings")(toksDf.join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"), first("dl")).count())
    // DSIR stage anatomy (q76 at sf0.1)
    val grams = concat(wordShingles(col("text"), 1), wordShingles(col("text"), 2))
    val bucketCol = (conv(substring(md5(concat(col("g"), lit(":imp"))), 1, 4), 16, 10)
      .cast("long") % 4096).as("b")
    time("dsir grams explode")(d.select(col("doc_id"), explode(grams).as("g")).count())
    time("dsir buckets")(d.select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), bucketCol).count())
    time("dsir perdoc agg")(d.select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), bucketCol)
      .groupBy("doc_id", "b").count().count())
    val tgt = d.where(col("source").isin("src0", "src1"))
    time("dsir full 1st")(graft.operators.Importance.weights(d, tgt, "doc_id", "text").count())
    time("dsir full 2nd")(graft.operators.Importance.weights(d, tgt, "doc_id", "text").count())
    spark.stop()
  }
}
