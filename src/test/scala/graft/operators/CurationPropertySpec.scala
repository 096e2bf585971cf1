package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven properties for the r12 curation operators, each checked
  * against an independent brute-force Scala reference (the operator's
  * distributed formulation must agree with the obvious quadratic one on
  * arbitrary corpora, not just the hand fixtures).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  // small vocab so random docs collide often — duplication is the point
  private val docGen: Gen[Seq[String]] = for {
    n <- Gen.choose(0, 14)
    ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
  } yield ts

  private def corpusGen(nDocs: Int): Gen[Seq[(Long, Seq[String])]] =
    Gen.listOfN(nDocs, docGen).map(_.zipWithIndex.map { case (ts, i) => (i.toLong, ts) })

  /** Brute-force reference: per doc, the covered-position set for k-gram
    * spans duplicated across >= minDocs distinct docs.
    */
  private def refCovered(corpus: Seq[(Long, Seq[String])], k: Int,
                         minDocs: Int): Map[Long, Set[Int]] = {
    val grams = corpus.flatMap { case (id, ts) =>
      ts.sliding(k).filter(_.size == k).zipWithIndex
        .map { case (g, i) => (id, i + 1, g.mkString(" ")) }
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= minDocs).keySet
    corpus.map { case (id, _) =>
      id -> grams.filter(w => w._1 == id && dup(w._3))
        .flatMap(w => w._2 until (w._2 + k)).toSet
    }.toMap
  }

  test("substring report agrees with the quadratic reference on random corpora") {
    for (seed <- 1L to 6L; k <- Seq(2, 3)) {
      val corpus = sample(corpusGen(14), seed * 31 + k)
      val df = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val ref = refCovered(corpus, k, minDocs = 2)
      val got = SubstringDedup.report(df, "doc_id", "text", k)
        .select("doc_id", "covered_tokens", "n_dup_windows")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val gramsAll = corpus.flatMap { case (d, t) =>
        t.sliding(k).filter(_.size == k).map(g => (d, g.mkString(" ")))
      }
      val dupG = gramsAll.groupBy(_._2)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      corpus.foreach { case (id, ts) =>
        assert(got(id)._1 === ref(id).size.toLong,
          s"seed=$seed k=$k doc=$id ts=$ts covered ${got(id)._1} != ref ${ref(id)}")
        val expectWins = ts.sliding(k).filter(_.size == k)
          .count(g => dupG(g.mkString(" ")))
        assert(got(id)._2 === expectWins.toLong, s"seed=$seed k=$k doc=$id windows")
      }
    }
  }

  test("keepFirst exempts each gram's lowest-id doc on random corpora") {
    val k = 2
    for (seed <- 20L to 24L) {
      val corpus = sample(corpusGen(12), seed)
      val df = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      // reference: a window is flagged iff its gram is duplicated (>= 2
      // distinct docs) AND this doc is not the gram's lowest id
      val grams = corpus.flatMap { case (id, ts) =>
        ts.sliding(k).filter(_.size == k).zipWithIndex
          .map { case (g, i) => (id, i + 1, g.mkString(" ")) }
      }
      val keepOf = grams.groupBy(_._3)
        .collect { case (g, ws) if ws.map(_._1).distinct.size >= 2 =>
          g -> ws.map(_._1).min }
      val covered = corpus.map { case (id, _) =>
        id -> grams.filter(w => w._1 == id &&
            keepOf.get(w._3).exists(_ != id))
          .flatMap(w => w._2 until (w._2 + k)).toSet
      }.toMap
      val got = SubstringDedup.removeSpans(df, "doc_id", "text", k = k,
          keepFirst = true)
        .as[(Long, String)].collect().toMap
      corpus.foreach { case (id, ts) =>
        val expect = ts.zipWithIndex
          .collect { case (t, i) if !covered(id)(i + 1) => t }.mkString(" ")
        assert(got(id) === expect, s"seed=$seed doc=$id ts=$ts")
      }
    }
  }

  test("removeSpans keeps exactly the uncovered tokens on random corpora") {
    for (seed <- 10L to 14L) {
      val corpus = sample(corpusGen(12), seed)
      val df = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val ref = refCovered(corpus, 3, minDocs = 2)
      val got = SubstringDedup.removeSpans(df, "doc_id", "text", k = 3)
        .as[(Long, String)].collect().toMap
      corpus.foreach { case (id, ts) =>
        val expect = ts.zipWithIndex
          .collect { case (t, i) if !ref(id)(i + 1) => t }.mkString(" ")
        assert(got(id) === expect, s"seed=$seed doc=$id ts=$ts")
      }
    }
  }

  test("BPE roundtrip identity holds for arbitrary merge lists and words") {
    val wordGen = for {
      n <- Gen.choose(1, 10)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    for (seed <- 1L to 8L) {
      val words = sample(Gen.listOfN(30, wordGen), seed)
      val docs = words.grouped(5).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
      val merges = Bpe.train(docs, "text", numMerges = 12)
      words.foreach { w =>
        val pieces = Bpe.encodeWord(w, merges)
        assert(pieces.mkString("") === w + Bpe.EndOfWord, s"seed=$seed word=$w")
        assert(pieces.nonEmpty && pieces.size <= w.length + 1)
      }
    }
  }

  test("incremental store equivalence holds on random corpora and random splits") {
    // the load-bearing theorem: reportAgainst(store(A), B) == report(A u B)
    // restricted to B, and the same for span removal — fuzzed, not just
    // the hand fixture
    for (seed <- 20L to 22L) {
      val all = sample(corpusGen(16), seed)
      val (a, b0) = all.partition(_._1 % 3 != 0)
      val b = b0.map { case (id, ts) => (id + 1000L, ts) } // disjoint id space
      val dfA = a.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val dfB = b.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory(s"substr_fuzz$seed").toString
      SubstringDedup.buildIndex(dfA, "doc_id", "text", k = 3, dir)
      val incRep = SubstringDedup.reportAgainst(spark, dir, dfB, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      val fullRep = SubstringDedup.report(dfA.union(dfB), "doc_id", "text", k = 3)
        .where($"doc_id" >= 1000L).orderBy("doc_id").collect().toSeq
      assert(incRep === fullRep, s"seed=$seed report")
      val incRm = SubstringDedup.removeSpansAgainst(spark, dir, dfB, "doc_id", "text")
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      val fullRm = SubstringDedup.removeSpans(dfA.union(dfB), "doc_id", "text", k = 3)
        .where($"doc_id" >= 1000L).orderBy("doc_id")
        .as[(Long, String)].collect().toSeq
      assert(incRm === fullRm, s"seed=$seed removal")
    }
  }

  test("BPE training is invariant to input partitioning") {
    val corpus = sample(corpusGen(12), 33L)
      .map { case (id, ts) => (id, ts.mkString(" ")) }
    val one = Bpe.train(corpus.toDF("doc_id", "text").coalesce(1), "text", 10)
    val many = Bpe.train(corpus.toDF("doc_id", "text").repartition(7), "text", 10)
    assert(one === many, "merge list must not depend on partitioning")
  }

  test("upsampleTokens agrees with a sequential reference on random strata") {
    val rowGen = for {
      src <- Gen.oneOf("s0", "s1", "s2")
      w <- Gen.choose(1L, 9L)
    } yield (src, w)
    for (seed <- 1L to 6L) {
      val rows = sample(Gen.listOfN(25, rowGen), seed)
        .zipWithIndex.map { case ((s, w), i) => (i.toLong, s, w) }
      val budgets = Seq(("s0", 40L), ("s1", 7L)) // s2 unbudgeted
      val df = rows.toDF("id", "src", "w").repartition(3)
      val got = Mix.upsampleTokens(df, "src", "id", "w",
          budgets.toDF("src", "budget"))
        .select("id", "epoch").as[(Long, Long)].collect().toSet
      // sequential reference: replicate each stratum in epochs, admit while
      // the row STARTS under budget
      // NB: .toSeq before flatMap — flatMapping a Map into tuples rebuilds
      // a Map and silently collapses (id, epoch) pairs by id
      val ref = rows.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
        val ordered = rs.sortBy(_._1)
        val tot = ordered.map(_._3).sum
        val starts = ordered.map(_._3).scanLeft(0L)(_ + _).init // per-row start
        budgets.toMap.get(src) match {
          case None => ordered.map(r => (r._1, 0L))
          case Some(b) =>
            val ne = math.max(1L, math.ceil(b.toDouble / tot).toLong)
            for {
              e <- 0L until ne
              (r, st) <- ordered.zip(starts)
              if e * tot + st < b
            } yield (r._1, e)
        }
      }.toSet
      assert(got === ref, s"seed=$seed")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("winnowing selection equals the definitional reference on random corpora") {
    val k = 3; val w = 4
    for (seed <- 1L to 6L) {
      val corpus = sample(corpusGen(12), seed * 31)
        .map { case (id, ts) => (id, ts.mkString(" ")) }
      val got = Winnow.fingerprints(corpus.toDF("doc_id", "text"),
          "doc_id", "text", k = k, w = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // definition: for every window of w gram hashes, select the
      // rightmost position attaining the window minimum
      val ref = corpus.flatMap { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val hs = toks.sliding(k).filter(_.size == k).zipWithIndex.map {
          case (g, i) => (i + 1, WinnowRef.gramHash(g.toSeq) >>> 24)
        }.toSeq
        hs.sliding(w).filter(_.size == w).flatMap { win =>
          val mn = win.map(_._2).min
          Some(win.filter(_._2 == mn).map(_._1).max)
            .map(p => (id, p.toLong, mn))
        }
      }.toSet
      assert(got === ref, s"seed=$seed")
    }
  }

  test("winnow span report equals the brute-force pair/run reference on random corpora") {
    val k = 3; val w = 4; val minShared = 2L
    for (seed <- 1L to 6L) {
      val corpus = sample(corpusGen(12), seed * 47)
        .map { case (id, ts) => (id, ts.mkString(" ")) }
      // reference fingerprints per doc: the definitional rightmost-argmin
      // selection (itself pinned against the engine in the test above)
      def fps(text: String): Set[(Long, Long)] = {
        val toks = text.split(" ").filter(_.nonEmpty)
        val hs = toks.sliding(k).filter(_.size == k).zipWithIndex.map {
          case (g, i) => (i + 1, WinnowRef.gramHash(g.toSeq) >>> 24)
        }.toSeq
        hs.sliding(w).filter(_.size == w).map { win =>
          val mn = win.map(_._2).min
          (win.filter(_._2 == mn).map(_._1).max.toLong, mn)
        }.toSet
      }
      val byDoc = corpus.map { case (id, t) => id -> fps(t) }.toMap
      // per qualifying pair, matched positions per side merge into runs at
      // radius gap + k (gap defaults to w)
      val gap = w
      def runs(ps: Seq[Long]): Seq[(Long, Long, Long)] = {
        val sorted = ps.distinct.sorted
        if (sorted.isEmpty) return Nil
        val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        var cur = scala.collection.mutable.ArrayBuffer(sorted.head)
        sorted.tail.foreach { p =>
          if (p - cur.last <= gap + k) cur += p
          else { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer(p) }
        }
        out += cur.toSeq
        out.map(r => (r.min, r.max + (k - 1), r.size.toLong)).toSeq
      }
      val expected = (for {
        (a, fa) <- byDoc.toSeq; (b, fb) <- byDoc.toSeq if a < b
        shared = fa.map(_._2) & fb.map(_._2)
        if shared.size >= minShared
        (doc, f) <- Seq((a, fa), (b, fb))
        span <- runs(f.collect { case (p, h) if shared(h) => p }.toSeq)
      } yield (a, b, doc, span._1, span._2, span._3)).toSet

      val got = Winnow.overlapSpans(corpus.toDF("doc_id", "text"),
          "doc_id", "text", k = k, w = w, minShared = minShared)
        .select("id_a", "id_b", "doc", "span_start", "span_end", "n_fp")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("span corruption equals a sequential reference on random docs") {
    val sp = 4; val ms = 3; val seed0 = 9L
    for (seed <- 1L to 5L) {
      val corpus = sample(corpusGen(8), seed * 17)
        .map { case (id, ts) => (id, ts.mkString(" ")) }
      val got = SpanCorrupt.corrupt(corpus.toDF("doc_id", "text"),
          "doc_id", "text", seed = seed0, startPeriod = sp, maxSpan = ms)
        .collect().map(r => (r.getLong(0),
          (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
      corpus.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        def coin(salt: String, p: Int): Long = java.lang.Long.parseLong(
          md5hex(s"$seed0:$salt:$id:$p").take(4), 16)
        val masked = Array.fill(toks.length)(false)
        toks.indices.foreach { p =>
          if (coin("s", p) % sp == 0) {
            val len = 1 + (coin("l", p) % ms).toInt
            (p until math.min(p + len, toks.length)).foreach(masked(_) = true)
          }
        }
        val inp = new StringBuilder; val tgt = new StringBuilder
        var isl = -1
        toks.indices.foreach { p =>
          val rs = masked(p) && (p == 0 || !masked(p - 1))
          if (rs) isl += 1
          val sent = s"<extra_id_$isl>"
          if (!masked(p)) { if (inp.nonEmpty) inp += ' '; inp ++= toks(p) }
          else if (rs) { if (inp.nonEmpty) inp += ' '; inp ++= sent }
          if (masked(p)) {
            if (tgt.nonEmpty) tgt += ' '
            if (rs) { tgt ++= sent; tgt += ' ' }
            tgt ++= toks(p)
          }
        }
        val nM = masked.count(identity).toLong
        assert(got(id) === ((inp.toString, tgt.toString, nM, (isl + 1).toLong)),
          s"seed=$seed doc=$id")
      }
    }
  }

  test("FIM split equals a sequential coin-replay reference on random docs") {
    val seed0 = 11L
    for (seed <- 1L to 5L) {
      val corpus = sample(corpusGen(10), seed * 13)
        .map { case (id, ts) => (id, ts.mkString(" ")) }
      val got = Fim.split(corpus.toDF("doc_id", "text"),
          "doc_id", "text", seed = seed0)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      corpus.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val n = toks.length
        def coin(salt: String): Long = java.lang.Long.parseLong(
          md5hex(s"$seed0:$salt:$id").take(15), 16)
        val want =
          if (coin("f") % 2 == 0 && n >= 2) {
            val (a, b) = (coin("a") % (n + 1), coin("b") % (n + 1))
            val (u, v) = (math.min(a, b).toInt, math.max(a, b).toInt)
            (Seq("<pre>") ++ toks.slice(0, u) ++ Seq("<suf>") ++
              toks.slice(v, n) ++ Seq("<mid>") ++ toks.slice(u, v))
              .mkString(" ")
          } else toks.mkString(" ")
        assert(got(id) === want, s"seed=$seed doc=$id")
      }
    }
  }
}
