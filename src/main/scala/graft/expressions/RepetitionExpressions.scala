package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** graft_repetition(text) → struct<top2_frac: double, dup3_frac: double> —
  * the two classic repetition-based quality filters for LLM training corpora
  * (the "Gopher rules" family):
  *
  *   - `top2_frac`: occurrences of the single most frequent word 2-gram over
  *     total 2-grams — catches boilerplate ("click here click here …");
  *   - `dup3_frac`: fraction of word 3-grams that are repeats of an earlier
  *     one (`1 − distinct/total`) — catches looping/templated text.
  *
  * Both are 0.0 for documents too short to form the n-gram. One tokenize
  * pass, counts in a per-row hash map, no shuffle: per-document metrics
  * stay narrow at 100 TB (a filter stage, not an aggregation), unlike the
  * explode→groupBy formulation which shuffles every n-gram of the corpus.
  * Exact string counts (no hashing shortcut), so any engine reproduces the
  * values bit-for-bit.
  */
case class RepetitionStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq((child.dataType, TextOps.isString, "string")))
  override def dataType: DataType = StructType(Seq(
    StructField("top2_frac", DoubleType, nullable = false),
    StructField("dup3_frac", DoubleType, nullable = false)))
  override def prettyName: String = "graft_repetition"

  override def nullSafeEval(text: Any): Any = {
    val toks = TextOps.tokenize(text.asInstanceOf[UTF8String].toLowerCase.toString)
    // top 2-gram fraction
    var top2 = 0.0
    val n2 = toks.length - 1
    if (n2 > 0) {
      val counts = new mutable.HashMap[String, Int]()
      var i = 0
      var maxC = 0
      while (i < n2) {
        val g = toks(i) + " " + toks(i + 1)
        val c = counts.getOrElse(g, 0) + 1
        counts.update(g, c)
        if (c > maxC) maxC = c
        i += 1
      }
      top2 = maxC.toDouble / n2
    }
    // duplicate 3-gram fraction
    var dup3 = 0.0
    val n3 = toks.length - 2
    if (n3 > 0) {
      val seen = new mutable.HashSet[String]()
      var i = 0
      while (i < n3) {
        seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      dup3 = (n3 - seen.size).toDouble / n3
    }
    InternalRow(top2, dup3)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** graft_normalize(text) — standard corpus text normalization, one pass:
  * lowercase (root locale) → Unicode NFC → strip diacritics (NFD, drop
  * combining marks) → collapse whitespace runs to single spaces → trim.
  * Composed and decomposed inputs ("é" vs "e"+U+0301) normalize to the same
  * bytes, so exact dedup and fingerprinting see them as equal — run this
  * BEFORE [[graft.operators.TextDedup]] hashing. Matches DuckDB's
  * `trim(regexp_replace(strip_accents(nfc_normalize(lower(x))),'\s+',' ','g'))`
  * on Latin-script text (both decompose then drop combining marks).
  */
case class NormalizeText(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkArgs(prettyName, Seq((child.dataType, TextOps.isString, "string")))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(text: Any): Any = {
    import java.text.Normalizer
    val lowered = text.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val nfc = Normalizer.normalize(lowered, Normalizer.Form.NFC)
    val decomposed = Normalizer.normalize(nfc, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    var lastWs = true // leading whitespace drops (implicit trim-left)
    while (i < decomposed.length) {
      val c = decomposed.charAt(i)
      val t = Character.getType(c)
      val isMark = t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK || t == Character.ENCLOSING_MARK
      if (!isMark) {
        if (Character.isWhitespace(c)) {
          if (!lastWs) { sb.append(' '); lastWs = true }
        } else { sb.append(c); lastWs = false }
      }
      i += 1
    }
    // trim-right: at most one trailing collapsed space
    if (sb.length > 0 && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
