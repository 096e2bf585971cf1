package graft.expressions

/** DuckDB SQL generators reproducing the native hash chain
  * ([[TextOps.hashString]] / [[TextOps.mix64]]) so the MinHash and SimHash
  * queries are hash-exact oracle-checkable instead of rows-only.
  *
  * DuckDB has no wrapping 64-bit arithmetic (BIGINT/UBIGINT overflow raises),
  * so the chain is emulated in non-negative HUGEINT "u64" space:
  * `mod 2^64` after adds, a hi/lo split multiply (each partial < 2^97, well
  * inside HUGEINT), xor via round-trip to signed BIGINT, and `>>> n` as
  * floor division. Multi-step `mix64` needs let-bindings, which SQL lacks —
  * each step is a CTE layer (`SELECT * REPLACE`). The seed constants
  * (`mix64(0)`, `j * GOLDEN2`) are computed HERE from the same JVM code the
  * native expressions run, so the oracle can never drift from the engine.
  *
  * Token/shingle folding assumes BMP text (codepoint == UTF-16 unit, so
  * DuckDB `unicode(c)` matches Java `charAt`); supplementary-plane text
  * would need a surrogate split. The driver corpora are BMP-only.
  */
object OracleHashSql {

  private val U = "18446744073709551616" // 2^64
  private val U32 = "4294967296" // 2^32

  private def mul(a: String, b: String): String =
    s"((((($a) % $U32) * $b) % $U + (((($a) // $U32) * $b) % $U32) * $U32) % $U)"

  /** u64 HUGEINT → signed BIGINT (two's complement). */
  private def toSigned(a: String): String =
    s"CAST(($a) - CASE WHEN ($a) >= 9223372036854775808 THEN CAST($U AS HUGEINT) ELSE CAST(0 AS HUGEINT) END AS BIGINT)"

  private def xor(a: String, b: String): String = {
    val x = s"xor(${toSigned(a)}, ${toSigned(b)})"
    s"(CASE WHEN $x < 0 THEN CAST($x AS HUGEINT) + $U ELSE CAST($x AS HUGEINT) END)"
  }

  /** Four CTE layers applying [[TextOps.mix64]] to column `c` of CTE `src`. */
  private def mixCte(prefix: String, src: String, c: String): String =
    s"""${prefix}1 AS (SELECT * REPLACE (($c + 11400714819323198485) % $U AS $c) FROM $src),
       |${prefix}2 AS (SELECT * REPLACE (${mul(xor(c, s"$c // 1073741824"), "13787848793156543929")} AS $c) FROM ${prefix}1),
       |${prefix}3 AS (SELECT * REPLACE (${mul(xor(c, s"$c // 134217728"), "10723151780598845931")} AS $c) FROM ${prefix}2),
       |${prefix}4 AS (SELECT * REPLACE (${xor(c, s"$c // 2147483648")} AS $c) FROM ${prefix}3)""".stripMargin

  private def u64(x: Long): java.math.BigInteger = {
    val b = java.math.BigInteger.valueOf(x)
    if (x < 0) b.add(java.math.BigInteger.ONE.shiftLeft(64)) else b
  }

  /** Per-string polynomial fold (Java semantics) as a list_reduce over
    * codepoints, yielding u64 HUGEINT column `v`.
    */
  private def foldCte(src: String, strCol: String): String =
    s"""SELECT $strCol, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
       |    list_transform(regexp_extract_all($strCol, '.'), c -> CAST(unicode(c) AS HUGEINT))),
       |    (h, c) -> (31*h + c) % $U) AS v FROM $src""".stripMargin

  private val m0 = u64(TextOps.mix64(0L)).toString

  /** Oracle for `posexplode(graft_minhash(text, n, k))`:
    * (doc_id, j, minhash) — min over shingles of
    * `mix64(hashString(shingle, 0) ^ j*GOLDEN2)` under SIGNED comparison.
    * `src` is any SQL relation exposing `(doc_id, text)` — default the
    * documents table; pass a parenthesized subquery to replay the chain
    * over a COMPOSED frame (e.g. q153's passages).
    */
  def minhashSig(n: Int, k: Int, src: String = "documents"): String = {
    val gram = (0 until n).map(i => if (i == 0) "ts[i]" else s"ts[i+$i]").mkString(" || ' ' || ")
    val seedRows = (0 until k)
      .map(j => s"(CAST($j AS INT), CAST(${u64(j * 0xC2B2AE3D27D4EB4FL)} AS HUGEINT))")
      .mkString(", ")
    val srcRef = if (src == "documents") "documents" else s"$src __mh_src"
    s"""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts FROM $srcRef),
       |sh AS (SELECT DISTINCT doc_id, $gram AS s
       |       FROM tok, UNNEST(generate_series(1, len(ts) - ${n - 1})) AS u(i) WHERE len(ts) >= $n),
       |str AS (${foldCte("(SELECT DISTINCT s FROM sh) t", "s")}),
       |x0 AS (SELECT s, ${xor("v", m0)} AS v FROM str),
       |${mixCte("b", "x0", "v")},
       |seeds AS (SELECT * FROM (VALUES $seedRows) AS t(j, jk)),
       |hx0 AS (SELECT sh.doc_id, seeds.j, ${xor("b4.v", "seeds.jk")} AS v
       |        FROM sh JOIN b4 USING (s) CROSS JOIN seeds),
       |${mixCte("m", "hx0", "v")}
       |SELECT doc_id, j, MIN(${toSigned("v")}) AS minhash
       |FROM m4 GROUP BY doc_id, j ORDER BY doc_id, j""".stripMargin
  }

  /** Oracle for `Knn.cosineNearDup` (hyperplane-LSH near-duplicate pairs):
    * the deterministic hyperplane components
    * `((mix64(seed*G1 + bit*G2 + dim) >>> 11) / 2^53) * 2 - 1` are computed
    * here and embedded as double literals (Java `Double.toString` round-trips,
    * DuckDB parses to the identical double), projections/norms/dots are
    * sequential `list_reduce` folds matching the JVM loop order exactly, so
    * even the sign decisions at bucket boundaries agree bit-for-bit.
    *
    * The `maxBucketSize` degeneracy cap is a no-op at oracle scale (≤500
    * vectors per band at sf0.01 vs the 10000 cap) and is omitted.
    */
  def hyperplaneCosineNearDup(seed: Int, nBits: Int, bandBits: Int, dim: Int,
                              threshold: Double): String = {
    def weight(b: Int, i: Int): Double = {
      val h = TextOps.mix64(seed.toLong * 0x9E3779B97F4A7C15L + b.toLong * 0xC2B2AE3D27D4EB4FL + i)
      ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val wlists = (0 until nBits).map(b =>
      (0 until dim).map(i => weight(b, i).toString).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    s"""WITH w AS (SELECT $wlists::DOUBLE[][] AS wl),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x FROM embeddings),
       |nrm AS (SELECT vec_id, x, sqrt(list_reduce(list_prepend(0.0, list_transform(x, v -> v*v)), (a,v) -> a+v)) AS nv FROM e),
       |n AS (SELECT vec_id, list_transform(x, v -> v/nv) AS nx FROM nrm WHERE nv > 0),
       |bit AS (SELECT e.vec_id, b.b,
       |         CASE WHEN list_reduce(list_prepend(0.0,
       |            list_transform(generate_series(1, $dim), k -> e.x[k] * w.wl[b.b+1][k])),
       |            (a,v) -> a+v) >= 0 THEN 1 ELSE 0 END AS s
       |        FROM e CROSS JOIN w CROSS JOIN (SELECT unnest(generate_series(0,${nBits - 1})) AS b) b),
       |band AS (SELECT vec_id, b // $bandBits AS band_idx, SUM(s * (2 ** (b % $bandBits))) AS band_val
       |         FROM bit GROUP BY vec_id, b // $bandBits),
       |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM band a JOIN band b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |         WHERE a.vec_id < b.vec_id),
       |pairs AS (SELECT DISTINCT id_a, id_b FROM cand),
       |sims AS (SELECT id_a, id_b,
       |          round(list_reduce(list_prepend(0.0,
       |            list_transform(generate_series(1, $dim), k -> na.nx[k] * nb.nx[k])),
       |            (a,v) -> a+v), 6) AS sim
       |         FROM pairs JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b)
       |SELECT id_a, id_b, sim FROM sims WHERE sim >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for the multimodal ANN query: the synthetic corpus
    * ([[graft.multimodal.Multimodal.syntheticCorpus]]) derives entirely from
    * `range(n)`, which DuckDB regenerates with `generate_series`; the stub
    * codec's strided signed-byte fold runs in u64 HUGEINT space, its float32
    * output chain in DuckDB REAL (true IEEE binary32, verified equal to JVM
    * float ops), and the brute-force ANN in double — so even the stubbed
    * media path is hash-exact end to end.
    */
  def multimodalAnn(nMedia: Int, dim: Int, nQueries: Int, k: Int): String = {
    val h0Rows = (0 until dim)
      .map(i => s"($i, CAST(${u64(1125899906842597L ^ (i * 0x9E3779B97F4A7C15L))} AS HUGEINT))")
      .mkString(", ")
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${nMedia - 1})) AS id),
       |corp AS (SELECT id, 256 + (id % 512) AS len FROM ids),
       |dims AS (SELECT * FROM (VALUES $h0Rows) AS t(i, h0)),
       |feat AS (SELECT c.id, d.i,
       |    list_reduce(list_prepend(d.h0,
       |      list_transform(generate_series(d.i, c.len - 1, $dim),
       |        j -> CAST(CASE WHEN (c.id*31 + j) % 256 >= 128 THEN (c.id*31 + j) % 256 - 256
       |                       ELSE (c.id*31 + j) % 256 END AS HUGEINT))),
       |      (h, b) -> ((31*h + b) % $U + $U) % $U) AS h
       |  FROM corp c CROSS JOIN dims d),
       |fv AS (SELECT id, i,
       |    CAST((CAST(h % 65536 AS REAL) / CAST(65535 AS REAL)) * CAST(2 AS REAL) - CAST(1 AS REAL) AS DOUBLE) AS v
       |  FROM feat),
       |vecs AS (SELECT id, list_transform(list_sort(list_zip(list(i), list(v)), 'ASC'), p -> p[2]) AS x
       |         FROM (SELECT id, i, v FROM fv) GROUP BY id),
       |nrm AS (SELECT id, x, sqrt(list_reduce(list_prepend(0.0, list_transform(x, v -> v*v)), (a,v) -> a+v)) AS nv FROM vecs),
       |n AS (SELECT id, list_transform(x, v -> v/nv) AS nx FROM nrm WHERE nv > 0),
       |q AS (SELECT id AS q_id, nx AS qx FROM n WHERE id < $nQueries),
       |s AS (SELECT q_id, n.id AS n_id,
       |        round(list_reduce(list_prepend(0.0,
       |          list_transform(generate_series(1, $dim), k -> q.qx[k] * n.nx[k])), (a,v) -> a+v), 6) AS sim
       |      FROM q CROSS JOIN n WHERE q.q_id <> n.id),
       |r AS (SELECT q_id, n_id, sim, CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INT) AS rank FROM s)
       |SELECT q_id, n_id, rank, sim FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** Oracle for [[graft.operators.Winnow.overlap]]: the native
    * `graft_gram_hashes` chain — per-token `hashString(t, 0)`, a k-step
    * FNV fold per window (one CTE layer per step, the mixCte pattern),
    * `mix64` — then winnowing's `(h >>> 24) * 2^20 + (2^20 - pos)`
    * encoding, the w-frame window MIN, the degenerate-hash cap, and the
    * fingerprint self-join. The FNV prime and fold seed are the same
    * constants [[TextOps]] compiles, so oracle and engine cannot drift.
    */
  def winnowOverlap(k: Int, w: Int, minShared: Long,
                    maxDocsPerHash: Long): String =
    s"""${winnowFpCtes(k, w, maxDocsPerHash)}
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= $minShared ORDER BY id_a, id_b""".stripMargin

  /** Oracle for [[graft.operators.Winnow.overlapAgainst]] with the q77
    * split convention (batch = `doc_id % 5 = 0`, index = the rest):
    * `(id_a, id_b, kind, n_shared)` — the store lifecycle must answer
    * exactly what the one-shot fingerprint computation answers.
    */
  def winnowIncremental(k: Int, w: Int, minShared: Long,
                        maxDocsPerHash: Long): String =
    s"""${winnowFpCtes(k, w, maxDocsPerHash)},
       |nf AS (SELECT doc_id, h FROM fp WHERE doc_id % 5 = 0),
       |obf AS (SELECT doc_id, h FROM fp WHERE doc_id % 5 <> 0),
       |no AS (SELECT nf.doc_id AS id_a, obf.doc_id AS id_b, 'new_old' AS kind,
       |         CAST(COUNT(*) AS BIGINT) AS n_shared
       |       FROM nf JOIN obf ON nf.h = obf.h GROUP BY 1, 2),
       |nn AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, 'new_new' AS kind,
       |         CAST(COUNT(*) AS BIGINT) AS n_shared
       |       FROM nf a JOIN nf b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_a, id_b, kind, n_shared
       |FROM (SELECT * FROM no UNION ALL SELECT * FROM nn)
       |WHERE n_shared >= $minShared ORDER BY kind, id_a, id_b""".stripMargin

  /** Oracle for [[graft.operators.Winnow.overlapSpans]]: pairs from the
    * capped fingerprint self-join as in [[winnowOverlap]], then each
    * side's matched positions (via the position-bearing `fpp` CTE) merged
    * into maximal runs — new run iff the position step exceeds
    * `maxGap + k` — with span bounds `[min pos, max pos + k - 1]`.
    */
  def winnowSpans(k: Int, w: Int, minShared: Long, maxDocsPerHash: Long,
                  maxGap: Int): String =
    s"""${winnowFpCtes(k, w, maxDocsPerHash)},
       |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |       FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $minShared),
       |ph AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.h
       |       FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
       |       JOIN pr ON pr.id_a = a.doc_id AND pr.id_b = b.doc_id),
       |mt AS (SELECT DISTINCT id_a, id_b, id_a AS doc, p.fpos AS pos
       |       FROM ph JOIN fpp p ON p.doc_id = ph.id_a AND p.h = ph.h
       |       UNION
       |       SELECT DISTINCT id_a, id_b, id_b AS doc, p.fpos AS pos
       |       FROM ph JOIN fpp p ON p.doc_id = ph.id_b AND p.h = ph.h),
       |rn AS (SELECT *, CASE WHEN COALESCE(pos - lag(pos) OVER
       |         (PARTITION BY id_a, id_b, doc ORDER BY pos),
       |         ${maxGap + k + 1}) > ${maxGap + k}
       |         THEN 1 ELSE 0 END AS nw FROM mt),
       |ri AS (SELECT *, SUM(nw) OVER (PARTITION BY id_a, id_b, doc
       |         ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run FROM rn)
       |SELECT id_a, id_b, doc, CAST(MIN(pos) AS BIGINT) AS span_start,
       |  CAST(MAX(pos) + ${k - 1} AS BIGINT) AS span_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_fp
       |FROM ri GROUP BY id_a, id_b, doc, run
       |ORDER BY id_a, id_b, doc, span_start""".stripMargin

  /** Oracle for [[graft.operators.Winnow.overlapSpansAgainst]] with the
    * q77 split convention (batch = `doc_id % 5 = 0`, store = the rest):
    * pair kinds as in [[winnowIncremental]], spans merged as in
    * [[winnowSpans]] — on the batch side only for `new_old` pairs (the
    * store carries no positions), on both sides for `new_new`.
    */
  def winnowSpansIncremental(k: Int, w: Int, minShared: Long,
                             maxDocsPerHash: Long, maxGap: Int): String =
    s"""${winnowFpCtes(k, w, maxDocsPerHash)},
       |nf AS (SELECT doc_id, h FROM fp WHERE doc_id % 5 = 0),
       |obf AS (SELECT doc_id, h FROM fp WHERE doc_id % 5 <> 0),
       |phNO AS (SELECT nf.doc_id AS id_a, obf.doc_id AS id_b, nf.h
       |        FROM nf JOIN obf ON nf.h = obf.h),
       |phNN AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.h
       |        FROM nf a JOIN nf b ON a.h = b.h AND a.doc_id < b.doc_id),
       |prNO AS (SELECT id_a, id_b FROM phNO GROUP BY 1, 2 HAVING COUNT(*) >= $minShared),
       |prNN AS (SELECT id_a, id_b FROM phNN GROUP BY 1, 2 HAVING COUNT(*) >= $minShared),
       |mt AS (
       |  SELECT DISTINCT ph.id_a, ph.id_b, 'new_old' AS kind, ph.id_a AS doc, p.fpos AS pos
       |  FROM phNO ph JOIN prNO pr ON pr.id_a = ph.id_a AND pr.id_b = ph.id_b
       |  JOIN fpp p ON p.doc_id = ph.id_a AND p.h = ph.h
       |  UNION
       |  SELECT DISTINCT ph.id_a, ph.id_b, 'new_new' AS kind, ph.id_a AS doc, p.fpos AS pos
       |  FROM phNN ph JOIN prNN pr ON pr.id_a = ph.id_a AND pr.id_b = ph.id_b
       |  JOIN fpp p ON p.doc_id = ph.id_a AND p.h = ph.h
       |  UNION
       |  SELECT DISTINCT ph.id_a, ph.id_b, 'new_new' AS kind, ph.id_b AS doc, p.fpos AS pos
       |  FROM phNN ph JOIN prNN pr ON pr.id_a = ph.id_a AND pr.id_b = ph.id_b
       |  JOIN fpp p ON p.doc_id = ph.id_b AND p.h = ph.h),
       |rn AS (SELECT *, CASE WHEN COALESCE(pos - lag(pos) OVER
       |         (PARTITION BY id_a, id_b, kind, doc ORDER BY pos),
       |         ${maxGap + k + 1}) > ${maxGap + k}
       |         THEN 1 ELSE 0 END AS nw FROM mt),
       |ri AS (SELECT *, SUM(nw) OVER (PARTITION BY id_a, id_b, kind, doc
       |         ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run FROM rn)
       |SELECT id_a, id_b, kind, doc, CAST(MIN(pos) AS BIGINT) AS span_start,
       |  CAST(MAX(pos) + ${k - 1} AS BIGINT) AS span_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_fp
       |FROM ri GROUP BY id_a, id_b, kind, doc, run
       |ORDER BY kind, id_a, id_b, doc, span_start""".stripMargin

  /** The shared fingerprint chain: token hashes → per-window FNV fold →
    * mix64 → winnow selection → degeneracy cap, ending in CTE
    * `fp(doc_id, h)` (and its position-bearing sibling
    * `fpp(doc_id, h, fpos)`).
    */
  private def winnowFpCtes(k: Int, w: Int, maxDocsPerHash: Long): String = {
    val fnvp = "1099511628211" // 0x100000001B3, the gram-fold FNV prime
    val foldLayers = (1 to k).map { j =>
      s"wf$j AS (SELECT doc_id, pos, tvs, (${mul("v", fnvp)} + tvs[pos + ${j - 1}]) % $U AS v FROM wf${j - 1})"
    }.mkString(",\n")
    s"""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts FROM documents),
       |tp AS (SELECT doc_id, i AS pos, ts[i] AS t FROM tok,
       |       UNNEST(generate_series(1, len(ts))) AS u(i)),
       |str AS (${foldCte("(SELECT DISTINCT t FROM tp) dt", "t")}),
       |x0 AS (SELECT t, ${xor("v", m0)} AS v FROM str),
       |${mixCte("b", "x0", "v")},
       |th AS (SELECT doc_id, pos, b4.v AS tv FROM tp JOIN b4 USING (t)),
       |ta AS (SELECT doc_id, list(tv ORDER BY pos) AS tvs FROM th GROUP BY doc_id),
       |wf0 AS (SELECT doc_id, i AS pos, tvs, CAST(1125899906842597 AS HUGEINT) AS v
       |        FROM ta, UNNEST(generate_series(1, len(tvs) - ${k - 1})) AS u(i)
       |        WHERE len(tvs) >= $k AND i <= 1048575),
       |$foldLayers,
       |wh AS (SELECT doc_id, pos, v FROM wf$k),
       |${mixCte("w", "wh", "v")},
       |venc AS (SELECT doc_id, pos,
       |  CAST(v // 16777216 AS BIGINT) * 1048576 + (1048576 - pos) AS v FROM w4),
       |mn AS (SELECT doc_id, pos, min(v) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mv FROM venc),
       |selp AS (SELECT DISTINCT doc_id, mv // 1048576 AS h,
       |         1048576 - mv % 1048576 AS fpos FROM mn WHERE pos >= $w),
       |sel AS (SELECT DISTINCT doc_id, h FROM selp),
       |cap AS (SELECT h FROM sel GROUP BY h HAVING COUNT(DISTINCT doc_id) <= $maxDocsPerHash),
       |fp AS (SELECT doc_id, h FROM sel JOIN cap USING (h)),
       |fpp AS (SELECT doc_id, h, fpos FROM selp JOIN cap USING (h))""".stripMargin
  }

  // XXH64 primes (xxHash spec; same constants as Spark's
  // catalyst.expressions.XXH64) as u64 BigInts — shared between the SQL
  // generator below and XxHash64OracleSpec's reference evaluator
  private[graft] val XxPrime1 = BigInt(u64(0x9E3779B185EBCA87L))
  private[graft] val XxPrime2 = BigInt(u64(0xC2B2AE3D27D4EB4FL))
  private[graft] val XxPrime3 = BigInt(u64(0x165667B19E3779F9L))
  private[graft] val XxPrime4 = BigInt(u64(0x85EBCA77C2B2AE63L))
  // seed(42) + PRIME64_5 + length(8) — hashLong's accumulator init
  private[graft] val XxHash0 = BigInt(u64(42L + 0x27D4EB2F165667C5L + 8L))

  // rotl in u64 space: the wrapped low part (mul already reduces mod 2^64)
  // and the high part occupy disjoint bit ranges, so plain + suffices
  private def rotl(c: String, r: Int): String =
    s"(${mul(c, (BigInt(1) << r).toString)} + ($c) // ${BigInt(1) << (64 - r)})"

  /** `XXH64.hashLong(seed 42)` as DATA: one step per SQL CTE layer and
    * per reference-fold step. Both interpreters — [[xxhash64LongCtes]]
    * (DuckDB SQL) and [[xxLongReference]] (BigInt, consumed by
    * XxHash64OracleSpec) — fold over THIS list, so primes, rotation
    * amounts, shift widths, and layer ORDER are single-sourced and cannot
    * drift apart (r18 advisory: a typo in a hand-transcribed literal
    * would previously pass the spec and surface only at the driver's
    * DuckDB compare). The residual unshared surface is the u64 string
    * algebra (`mul`/`xor`/`rotl`) — itself exercised hash-exactly by the
    * MinHash/SimHash driver gates.
    */
  sealed private[graft] trait XxStep
  private[graft] final case class XxMul(p: BigInt) extends XxStep
  private[graft] final case class XxRotl(r: Int) extends XxStep
  private[graft] final case class XxXorConst(k: BigInt) extends XxStep
  private[graft] final case class XxMulAdd(p: BigInt, a: BigInt) extends XxStep
  private[graft] final case class XxXorShr(s: Int) extends XxStep

  private[graft] val XxLongSteps: Seq[XxStep] = Seq(
    XxMul(XxPrime2), XxRotl(31), XxMul(XxPrime1), XxXorConst(XxHash0),
    XxRotl(27), XxMulAdd(XxPrime1, XxPrime4), XxXorShr(33),
    XxMul(XxPrime2), XxXorShr(29), XxMul(XxPrime3), XxXorShr(32))

  /** Reference u64 evaluation of [[XxLongSteps]] over BigInt. */
  private[graft] def xxLongReference(v: Long): BigInt = {
    val u = BigInt(1) << 64
    def mulU(a: BigInt, b: BigInt) = (a * b) % u
    XxLongSteps.foldLeft(BigInt(u64(v))) { (c, st) => st match {
      case XxMul(p) => mulU(c, p)
      case XxRotl(r) => mulU(c, BigInt(1) << r) + (c >> (64 - r))
      case XxXorConst(k) => c ^ k
      case XxMulAdd(p, a) => (mulU(c, p) + a) % u
      case XxXorShr(s) => c ^ (c >> s)
    }}
  }

  private def xxStepSql(st: XxStep, c: String): String = st match {
    case XxMul(p) => mul(c, p.toString)
    case XxRotl(r) => rotl(c, r)
    case XxXorConst(k) => xor(k.toString, c)
    case XxMulAdd(p, a) => s"((${mul(c, p.toString)} + $a) % $U)"
    case XxXorShr(s) => xor(c, s"($c) // ${BigInt(1) << s}")
  }

  /** CTE layers computing Spark's `xxhash64` of ONE non-null BIGINT column
    * — `XXH64.hashLong(v, seed = 42)` — over u64 HUGEINT column `c` of CTE
    * `src`, in place; the final layer is `${prefix}11`. Used to replay the
    * bucketed-CDC partition function `pmod(xxhash64(key), nBuckets)`: for
    * a power-of-two nBuckets the signed pmod equals `c % nBuckets` taken
    * in u64 space (low bits are sign-invariant), so no sign round-trip is
    * needed after the chain.
    */
  def xxhash64LongCtes(prefix: String, src: String, c: String): String =
    XxLongSteps.zipWithIndex.map { case (st, i) =>
      val from = if (i == 0) src else s"$prefix$i"
      s"${prefix}${i + 1} AS (SELECT * REPLACE (${xxStepSql(st, c)} AS $c) FROM $from)"
    }.mkString(",\n")

  /** Oracle for q164 (bucketed O(delta) CDC): the q144 closed-form
    * latest-wins truth of the five-day change log, PLUS the physical
    * bucket assignment (`pmod(xxhash64(doc_id), nBuckets)` replayed via
    * [[xxhash64LongCtes]]) and the per-batch touched-bucket counts — the
    * oracle proves the partition pruning, not just the answer. One row
    * per micro-batch; the snapshot digests repeat on every row.
    */
  def bucketedCdc(nBuckets: Int): String = {
    require((nBuckets & (nBuckets - 1)) == 0,
      s"power-of-two nBuckets keeps the signed pmod == u64 mod: $nBuckets")
    val dayPreds = Seq("doc_id % 5 <> 4", "doc_id % 5 = 4", "doc_id % 3 = 0",
      "doc_id % 7 = 0", "doc_id % 14 = 0")
    val touchedRows = dayPreds.zipWithIndex.map { case (p, i) =>
      s"SELECT CAST($i AS BIGINT) AS batch_id, " +
        s"CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_touched FROM buck WHERE $p"
    }.mkString("\n  UNION ALL ")
    // per-row lower-64-bits of md5, byte-reversed (little-endian) —
    // the same version-stable substr(md5) hex algebra the shard oracles
    // use, NOT the md5_number_* builtins (DuckDB-version-sensitive byte
    // order). Summed in HUGEINT, folded mod 2^62, emitted as BIGINT so
    // the compare never crosses a float64 boundary.
    val lo64Hex = (0 until 8).map(i => s"substr(h, ${31 - 2 * i}, 2)")
      .mkString(" || ")
    val mod62 = BigInt(1) << 62
    def digestCol(hashedExpr: String, from: String, as: String): String =
      s"""(SELECT CAST(SUM(v) % $mod62 AS BIGINT) AS $as
         |    FROM (SELECT CAST(CAST('0x' || $lo64Hex AS UBIGINT) AS HUGEINT) AS v
         |          FROM (SELECT md5($hashedExpr) AS h FROM $from)))""".stripMargin
    s"""WITH xx0 AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS h FROM documents),
       |${xxhash64LongCtes("xx", "xx0", "h")},
       |buck AS (SELECT doc_id, CAST(h % $nBuckets AS BIGINT) AS bucket FROM xx11),
       |truth AS (SELECT doc_id,
       |    CASE WHEN doc_id % 14 = 0 THEN md5('v2:' || text)
       |         WHEN doc_id % 3 = 0 THEN md5('v1:' || text)
       |         ELSE md5('v0:' || text) END AS payload,
       |    CAST(CASE WHEN doc_id % 14 = 0 THEN 4
       |         WHEN doc_id % 3 = 0 THEN 2
       |         WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS BIGINT) AS ts
       |  FROM documents
       |  WHERE NOT (doc_id % 7 = 0 AND doc_id % 14 <> 0)),
       |snap AS (SELECT CAST(COUNT(*) AS BIGINT) AS snap_rows FROM truth),
       |ss AS ${digestCol("CAST(doc_id AS VARCHAR) || ':' || payload || ':' || ts",
                          "truth", "snap_sum")},
       |bs AS ${digestCol("CAST(t.doc_id AS VARCHAR) || ':' || b.bucket",
                          "truth t JOIN buck b USING (doc_id)", "bucket_sum")},
       |touched AS ($touchedRows)
       |SELECT t.batch_id, t.n_touched, s.snap_rows, ss.snap_sum, bs.bucket_sum
       |FROM touched t, snap s, ss, bs ORDER BY t.batch_id""".stripMargin
  }

  /** Oracle for `graft_simhash(text)`: per-token hash, per-bit ±1 majority
    * (tie → 0), bits reassembled into a signed 64-bit value.
    */
  def simhash(): String = {
    val bitRows = (0 until 64)
      .map(b => s"($b, CAST(${java.math.BigInteger.ONE.shiftLeft(b)} AS HUGEINT))")
      .mkString(", ")
    s"""WITH dtok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tk FROM documents),
       |tstr AS (${foldCte("(SELECT DISTINCT tk FROM dtok) t", "tk")}),
       |x0 AS (SELECT tk, ${xor("v", m0)} AS v FROM tstr),
       |${mixCte("b", "x0", "v")},
       |bits AS (SELECT * FROM (VALUES $bitRows) AS t(b, p)),
       |cnt AS (SELECT d.doc_id, bits.b,
       |          SUM(CASE WHEN (h.v // bits.p) % 2 = 1 THEN 1 ELSE -1 END) AS c
       |        FROM dtok d JOIN b4 h USING (tk) CROSS JOIN bits
       |        GROUP BY d.doc_id, bits.b),
       |sig AS (SELECT cnt.doc_id,
       |          SUM(CASE WHEN cnt.c > 0 THEN bits.p ELSE CAST(0 AS HUGEINT) END) AS v
       |        FROM cnt JOIN bits USING (b) GROUP BY cnt.doc_id)
       |SELECT d.doc_id, COALESCE(${toSigned("sig.v")}, 0) AS simhash
       |FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}
