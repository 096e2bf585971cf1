package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-pipeline hot path.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * CodegenFallback — every lambda step is an interpreted expression-tree
  * walk with per-element boxing. For shingling + MinHash that costs ~1 ms per
  * document; these expressions do the same work in one tight JVM loop per
  * row (~µs). They are deterministic, null-safe, and distribute as ordinary
  * projections (narrow, no shuffle).
  */
private[expressions] object TextOps {

  /** Whitespace per regex \s (ASCII), matching `regexp_extract_all('\S+')`
    * tokenization in both Spark and DuckDB oracles.
    */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def tokenize(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** Space-joined word n-grams — exact same strings as the HOF/SQL
    * formulation (`ts[i] || ' ' || ts[i+1] ...`). Callers pass text already
    * lowercased via `UTF8String.toLowerCase`, the same routine `lower()`
    * uses, so the native path equals the engine's `lower()` BY CONSTRUCTION
    * — they cannot diverge from each other. (UTF8String's own non-ASCII
    * slow path delegates to the default-locale String.toLowerCase, so
    * engine-vs-DuckDB oracle parity for non-ASCII text additionally assumes
    * a root-like JVM locale — the deployment default here.)
    */
  def shingles(text: String, n: Int, distinct: Boolean): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) return Array.empty
    val m = toks.length - n + 1
    val out = new Array[String](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    if (distinct) out.distinct else out
  }

  /** splitmix64 finalizer — cheap, well-mixed 64-bit hash step. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Polynomial string hash folded through mix64 with a seed — the MinHash
    * family h_i(s).
    */
  def hashString(s: String, seed: Long): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    mix64(h ^ mix64(seed))
  }

  /** Argument-type validation at analysis time (AbstractDataType /
    * ExpectsInputTypes are private[sql], so spelled out): SQL misuse like
    * `graft_shingles(text, 3L)` fails with an AnalysisException instead of an
    * executor-side ClassCastException.
    */
  def checkArgs(name: String, args: Seq[(DataType, DataType => Boolean, String)]): TypeCheckResult = {
    args.zipWithIndex.collectFirst {
      case ((dt, ok, want), i) if !ok(dt) =>
        TypeCheckResult.TypeCheckFailure(
          s"$name: argument ${i + 1} expects $want, got ${dt.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  val isString: DataType => Boolean = _.isInstanceOf[StringType]
  val isInt: DataType => Boolean = _ == IntegerType
}

/** graft_shingles(text, n) → array<string> of word n-grams — distinct set by
  * default (Jaccard), every occurrence when distinct=false (corpus counts).
  */
case class Shingles(left: Expression, right: Expression, distinct: Boolean = true)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq(
      (left.dataType, TextOps.isString, "string"),
      (right.dataType, TextOps.isInt, "int")))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (distinct) "graft_shingles" else "graft_shingles_all"

  override def nullSafeEval(text: Any, n: Any): Any = {
    val arr = TextOps.shingles(text.asInstanceOf[UTF8String].toLowerCase.toString,
      n.asInstanceOf[Int], distinct)
    new GenericArrayData(arr.map(UTF8String.fromString(_): Any))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Shingles =
    copy(left = l, right = r)
}

/** graft_minhash(text, n, k) → array<long> MinHash signature over the word
  * n-gram shingle set; null when the document has fewer than n tokens.
  * (MinHash over the multiset equals MinHash over the set, so no distinct
  * pass is needed.)
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq(
      (first.dataType, TextOps.isString, "string"),
      (second.dataType, TextOps.isInt, "int"),
      (third.dataType, TextOps.isInt, "int")))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // a document with fewer than n tokens yields a NULL signature even when
  // the text column itself is non-nullable — without this override the
  // inherited input-derived nullability tells the optimizer the value can
  // never be null, and a constant-folding/local-relation pass NPEs (or a
  // null-stripping rewrite silently miscompiles) on any short document
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(text: Any, n: Any, k: Any): Any = {
    val sh = TextOps.shingles(text.asInstanceOf[UTF8String].toLowerCase.toString,
      n.asInstanceOf[Int], distinct = false)
    if (sh.isEmpty) return null
    val kk = k.asInstanceOf[Int]
    val sig = Array.fill(kk)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val base = TextOps.hashString(sh(i), 0L)
      var j = 0
      while (j < kk) {
        // One string pass per shingle; per-hash variation via mix64 chaining.
        val h = TextOps.mix64(base ^ (j * 0xC2B2AE3D27D4EB4FL))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig.map(x => x: Any))
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): MinHashSig =
    copy(first = a, second = b, third = c)
}

/** graft_simhash(text) → 64-bit SimHash of the token multiset. */
case class SimHash(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq((child.dataType, TextOps.isString, "string")))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(text: Any): Any = {
    val toks = TextOps.tokenize(
      text.asInstanceOf[UTF8String].toLowerCase.toString)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = TextOps.hashString(toks(i), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** graft_gram_hashes(text, k) → array<long>: one 64-bit hash per k-token
  * window, in positional order — the substring-dedup hot path WITHOUT
  * materializing gram strings. Each token hashes once
  * ([[TextOps.hashString]]); a window's hash is the polynomial combination
  * of its k token hashes folded through mix64, so two windows collide iff
  * their token-hash sequences collide (same ~2^-64 per-pair rate the
  * string-hash path has). O(n·k) multiply-adds replace O(n·k·len) string
  * building + hashing; empty array when the document has fewer than k
  * tokens.
  */
case class GramHashes(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq(
      (left.dataType, TextOps.isString, "string"),
      (right.dataType, TextOps.isInt, "int")))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(text: Any, k: Any): Any = {
    val kk = k.asInstanceOf[Int]
    val toks = TextOps.tokenize(
      text.asInstanceOf[UTF8String].toLowerCase.toString)
    if (kk <= 0 || toks.length < kk)
      return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = TextOps.hashString(toks(i), 0L); i += 1 }
    val m = toks.length - kk + 1
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      var h = 1125899906842597L
      var j = i
      while (j < i + kk) { h = h * 0x100000001B3L + th(j); j += 1 }
      out(i) = TextOps.mix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GramHashes =
    copy(left = l, right = r)
}
