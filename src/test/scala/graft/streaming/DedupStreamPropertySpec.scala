package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files
import scala.util.Random

/** Randomized reference for the streaming admission LOGIC (q162's engine
  * gates one natural corpus; this pins the semantics across seeded random
  * corpora with planted near-duplicates): take the verified-pair set V
  * from the ENGINE's one-shot minHashNearDup over the whole corpus — the
  * batch-independent fact both paths share — then fold the sequential
  * admission rule in plain Scala: batch k drops x iff x has a V-edge to
  * an earlier ADMITTED doc (a doc dropped earlier never entered the
  * index, so it can't drop anyone) or to a smaller batch-mate. The
  * streaming path, run file-per-batch over the same slices, must admit
  * exactly that set.
  */
class DedupStreamPropertySpec extends SparkSpec {
  import spark.implicits._

  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  test("streaming admission equals the plain-Scala fold over engine pairs, 4 seeds") {
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      // base docs plus planted near-dups: a near-dup copies a base doc and
      // perturbs one word, so exact-Jaccard verification genuinely decides
      val base = (0 until 24).map { i =>
        i.toLong -> Seq.fill(8 + rnd.nextInt(5))(words(rnd.nextInt(words.size)))
          .mkString(" ")
      }
      val dups = (0 until 12).map { j =>
        val (srcId, srcText) = base(rnd.nextInt(base.size))
        val toks = srcText.split(" ").toVector
        val mut =
          if (rnd.nextBoolean()) toks.updated(rnd.nextInt(toks.size), words(rnd.nextInt(words.size)))
          else toks
        (100L + j) -> mut.mkString(" ")
      }
      val corpus = (base ++ dups).sortBy(_._1)
      val nBatches = 3
      def batchOf(id: Long): Int = (id % nBatches).toInt

      // engine's batch-independent verified-pair set (symmetric edges)
      val ver = graft.operators.TextDedup.minHashNearDup(
          corpus.toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 2, numHashes = 16, rowsPerBand = 2, threshold = 0.6)
        .select("id_a", "id_b").as[(Long, Long)].collect()
      val edges = ver.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).toSet }

      // plain-Scala sequential admission fold
      var admitted = Set.empty[Long]
      (0 until nBatches).foreach { b =>
        val batch = corpus.map(_._1).filter(batchOf(_) == b).sorted
        batch.foreach { id =>
          val es = edges.getOrElse(id, Set.empty)
          val dropForIndex = es.exists(admitted)
          val dropForMate = es.exists(m => batchOf(m) == b && m < id)
          if (!dropForIndex && !dropForMate) admitted += id
        }
      }

      // the streaming path over the same slices, one file per micro-batch
      val root = Files.createTempDirectory(s"graft_ddfz_$seed").toString
      val in = s"$root/in"
      Files.createDirectories(java.nio.file.Paths.get(in))
      val fs = new org.apache.hadoop.fs.Path(in)
        .getFileSystem(spark.sessionState.newHadoopConf())
      (0 until nBatches).foreach { b =>
        val lines = corpus.filter(c => batchOf(c._1) == b)
          .map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
        Files.write(java.nio.file.Paths.get(in, s"b$b.json"),
          lines.mkString("\n").getBytes("UTF-8"))
        // pin batch order by mtime (the q149/q162 stamp convention)
        fs.setTimes(new org.apache.hadoop.fs.Path(s"$in/b$b.json"),
          1000000L * (b + 1), -1)
      }
      DedupStream.run(spark, in,
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))),
        s"$root/idx", s"$root/out", s"$root/ckpt", "doc_id", "text",
        shingleN = 2, numHashes = 16, rowsPerBand = 2,
        maxBucketSize = 100000, threshold = 0.6,
        maxFilesPerTrigger = Some(1))
      val streamed = DedupStream.admitted(spark, s"$root/out")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === admitted, s"seed=$seed")
      // sanity: the seeds genuinely exercise drops
      assert(admitted.size < corpus.size, s"seed=$seed planted dups all admitted?")
    }
  }
}
