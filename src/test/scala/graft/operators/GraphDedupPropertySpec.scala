package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized references for the two pieces of machinery every dedup gate
  * leans on: connected components (the clustering step behind
  * q48/q81/q83/q88/q111) against a driver-side union-find, and the exact
  * inverted-index Jaccard pair table (the GROUND TRUTH other recall gates
  * measure against, q22/q85) against an O(n²) set-overlap reference.
  * Random graphs include self-loops, duplicate/reversed edges, and edge
  * endpoints absent from the vertex frame; random corpora use a tiny
  * vocabulary so shingle collisions and exact-threshold ties are common.
  */
class GraphDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("components equal a union-find reference on random graphs (absent endpoints conduct)") {
    (1L to 6L).foreach { seed =>
      val nV = 12
      val vertexIds = sample(Gen.someOf(0L to 15L), seed).toSeq.sorted
      val edgesRaw = sample(Gen.listOfN(18,
        Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L))), seed + 7)
      // union-find over ALL ids seen (vertices + endpoints); component
      // label = min REACHABLE id, reported for vertex-frame rows only
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      vertexIds.foreach(find)
      edgesRaw.foreach { case (a, b) => union(a, b) }
      val expected = vertexIds.map(v => v -> find(v)).toMap

      val vdf = vertexIds.toDF("id")
      val edf = edgesRaw.toDF("a", "b")
      // localEdgeLimit = 0 forces the distributed iteration; the default
      // takes the local union-find fallback — BOTH must equal the
      // reference (and therefore each other) on every random graph
      for (pj <- Seq(true, false); lim <- Seq(0, 1 << 19)) {
        val got = ConnectedComponents.components(spark, vdf, edf,
            idCol = "id", aCol = "a", bCol = "b", pointerJump = pj,
            localEdgeLimit = lim)
          .as[(Long, Long)].collect().toMap
        assert(got === expected, s"seed=$seed pointerJump=$pj limit=$lim")
      }
      val _ = nV
    }
  }

  test("components with assumeEdgesClosed equal the open-world result on closed graphs") {
    (1L to 4L).foreach { seed =>
      val vertexIds = (0L to 9L)
      val edges = sample(Gen.listOfN(12,
        Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L))), seed)
      val vdf = vertexIds.toDF("id")
      val edf = edges.toDF("a", "b")
      val open = ConnectedComponents.components(spark, vdf, edf,
        idCol = "id", aCol = "a", bCol = "b").as[(Long, Long)].collect().toMap
      val closed = ConnectedComponents.components(spark, vdf, edf,
        idCol = "id", aCol = "a", bCol = "b", assumeEdgesClosed = true)
        .as[(Long, Long)].collect().toMap
      assert(open === closed, s"seed=$seed")
    }
  }

  test("exact jaccard pairs equal the O(n^2) set-overlap reference on random corpora") {
    val words = Seq("a", "b", "c", "d", "e")
    val docGen = Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(words)).map(_.mkString(" ")))
    (1L to 6L).foreach { seed =>
      val docs = sample(Gen.listOfN(15, docGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val n = 2
      val threshold = 0.3
      def shingleSetOf(t: String): Set[String] = {
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (toks.length < n) Set.empty
        else toks.sliding(n).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (id, t) => id -> shingleSetOf(t) }
      val expected = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib && sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= threshold
      } yield (ia, ib)).toSet

      val got = TextDedup.jaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingleN = n, threshold = threshold)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("band-store candidates equal the one-shot LSH pairs, reoriented (fuzz)") {
    val words = Seq("a", "b", "c", "d", "e")
    val docGen = Gen.choose(2, 9).flatMap(nw =>
      Gen.listOfN(nw, Gen.oneOf(words)).map(_.mkString(" ")))
    (1L to 4L).foreach { seed =>
      val docs = sample(Gen.listOfN(14, docGen), seed * 13).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val (store, batch) = docs.partition(_._1 % 3 != 0)
      val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_fuzz_").toString
      MinHashIndex.write(store.toDF("doc_id", "text"), "doc_id", "text",
        dir, shingleN = 2, numHashes = 8, rowsPerBand = 2)
      val got = MinHashIndex.candidates(MinHashIndex.open(spark, dir),
          batch.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, String)].collect().toSet

      // one-shot reference over the union (itself oracle-gated, q22/q77):
      // keep pairs touching the batch; orient new_old batch-first
      val batchIds = batch.map(_._1).toSet
      val oneShot = TextDedup.minHashCandidates(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingleN = 2, numHashes = 8, rowsPerBand = 2)
        .select("id_a", "id_b").as[(Long, Long)].collect()
      val expected = oneShot.flatMap { case (a, b) =>
        (batchIds(a), batchIds(b)) match {
          case (true, true)  => Some((a, b, "new_new"))
          case (true, false) => Some((a, b, "new_old"))
          case (false, true) => Some((b, a, "new_old"))
          case _             => None // old-old: store was already deduped
        }
      }.toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("decontamination report and fraction-clean equal the set-math reference") {
    val words = Seq("a", "b", "c", "d", "e")
    val docGen = Gen.choose(2, 8).flatMap(nw =>
      Gen.listOfN(nw, Gen.oneOf(words)).map(_.mkString(" ")))
    val n = 2
    def shingleSetOf(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Set.empty else toks.sliding(n).map(_.mkString(" ")).toSet
    }
    (1L to 4L).foreach { seed =>
      val train = sample(Gen.listOfN(12, docGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val bench = sample(Gen.listOfN(4, docGen), seed + 99).zipWithIndex
        .map { case (t, i) => (1000L + i, t) }
      val benchSet = bench.flatMap { case (_, t) => shingleSetOf(t) }.toSet
      val expected = train.map { case (id, t) =>
        val s = shingleSetOf(t)
        (id, s.size.toLong, (s & benchSet).size.toLong)
      }
      val maxFrac = 0.3
      val expectedKept = expected.collect {
        case (id, ns, ov) if ns == 0 || ov.toDouble / ns <= maxFrac => id
      }.toSet

      val trainDf = train.toDF("doc_id", "text")
      val benchDf = bench.toDF("doc_id", "text")
      val rep = Decontaminate.report(trainDf, benchDf, "doc_id", "text", shingleN = n)
        .select("doc_id", "n_shingles", "n_overlap")
        .as[(Long, Long, Long)].collect().toSet
      assert(rep === expected.toSet, s"seed=$seed report")
      val kept = Decontaminate.cleanByFraction(trainDf, benchDf, "doc_id", "text",
          maxFrac, shingleN = n)
        .select("doc_id").as[Long].collect().toSet
      assert(kept === expectedKept, s"seed=$seed cleanByFraction")
    }
  }
}
