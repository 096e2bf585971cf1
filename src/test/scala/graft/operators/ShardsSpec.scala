package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = spark.range(n)
    .select(col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"))

  test("assign is a permutation: every row exactly once, pos dense per shard") {
    val a = Shards.assign(corpus(500), "doc_id", numShards = 8, seed = 7L)
    assert(a.count() === 500L)
    assert(a.select("doc_id").distinct().count() === 500L)
    assert(a.agg(max("shard")).head.getInt(0) < 8)
    assert(a.agg(min("shard")).head.getInt(0) >= 0)
    // pos is 1..n_k dense within each shard
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1L || col("d") =!= col("n"))
    assert(bad.count() === 0L)
  }

  test("assignment is invariant to input partitioning and row order") {
    val base = corpus(300)
    val a = Shards.assign(base, "doc_id", 4, seed = 11L)
      .select("doc_id", "shard", "pos").collect().sortBy(_.getLong(0))
    val shuffled = base.repartition(13).orderBy(rand(99))
    val b = Shards.assign(shuffled, "doc_id", 4, seed = 11L)
      .select("doc_id", "shard", "pos").collect().sortBy(_.getLong(0))
    assert(a.toSeq === b.toSeq)
  }

  test("different seeds give different permutations; same seed identical") {
    val base = corpus(200)
    def perm(seed: Long) = Shards.assign(base, "doc_id", 4, seed)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(perm(1L) === perm(1L))
    assert(perm(1L) !== perm(2L))
  }

  test("shards are balanced (md5 spreads sequential ids)") {
    val a = Shards.assign(corpus(4000), "doc_id", 8, seed = 42L)
    val sizes = a.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length === 8)
    // expected 500 per shard; md5 uniformity keeps fluctuation well
    // within +-30% at this n
    assert(sizes.min > 350 && sizes.max < 650, sizes.toSeq)
  }

  test("balanced at realistic shard counts (32-bit key, numShards = 1e5)") {
    // the regression this pins: a 16-bit shard key mod 100k can only hit
    // shards 0..65535 (and doubles the mass of low ids); the 32-bit key
    // must occupy far more than 2^16 shards and keep per-shard counts at
    // Poisson(lambda = 2) scale
    val a = Shards.assign(corpus(200000), "doc_id", numShards = 100000,
        seed = 42L)
      .groupBy("shard").count().collect()
    val occupied = a.length.toLong
    assert(occupied > 70000L,
      s"only $occupied of 100000 shards occupied — shard key too narrow")
    assert(a.map(_.getLong(1)).max <= 15L,
      "a shard far above the Poisson(2) tail — shard key biased")
  }

  test("assign refuses inputs that already carry shard/ord/pos") {
    val clash = corpus(10).withColumn("pos", lit(1))
    val e = intercept[IllegalArgumentException] {
      Shards.assign(clash, "doc_id", 4)
    }
    assert(e.getMessage.contains("pos"))
  }

  test("file order survives a shard splitting into multiple files") {
    val dir = java.nio.file.Files.createTempDirectory("shardsplit").toString
    val base = corpus(400)
    val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 20L)
    try Shards.write(base, "doc_id", numShards = 4, path = dir, seed = 5L)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
      case None => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    val files = new java.io.File(s"$dir/shard=2").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "shard must have split for this test to bite")
    val want = Shards.assign(base, "doc_id", 4, seed = 5L)
      .where(col("shard") === 2).orderBy("pos")
      .select("doc_id").as[Long].collect().toSeq
    // read files in NAME order (part-...c000 < c001 < ...), concatenating
    val got = files.sortBy(_.getName).flatMap(f =>
      spark.read.parquet(f.getPath).select("doc_id").as[Long].collect()).toSeq
    assert(got === want,
      "order must survive the writer rolling to a new file")
  }

  test("write emits hive shard dirs whose file order IS the shuffle order") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val base = corpus(400)
    Shards.write(base, "doc_id", numShards = 4, path = dir, seed = 5L)
    val back = spark.read.parquet(dir)
    assert(back.count() === 400L)
    assert(back.select("shard").distinct().count() === 4L)
    // read one shard file directly: its row order must equal the assign
    // order (parquet preserves row order within a file)
    val want = Shards.assign(base, "doc_id", 4, seed = 5L)
      .where(col("shard") === 2).orderBy("pos")
      .select("doc_id").as[Long].collect().toSeq
    val got = spark.read.parquet(s"$dir/shard=2")
      .select("doc_id").as[Long].collect().toSeq
    assert(got === want)
  }
}
