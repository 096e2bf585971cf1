package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every published training
  * corpus runs before release (the C4 / Dolma / FineWeb recipe: regex
  * families for emails, phone numbers, IP addresses and id-shaped digit
  * runs, replaced with TYPED placeholders so a model cannot memorize a
  * real contact while the text keeps its shape for training).
  *
  * Patterns are deliberately RE2-compatible ASCII — no lookaround, no
  * backreferences, `\d`/`\b` over ASCII word chars where Java regex and
  * RE2 agree bit-for-bit — so the same pattern text runs identically
  * under Spark's Java engine and an RE2-family engine, which is what lets
  * redaction gate hash-exact cross-engine. They trade recall for
  * precision the way corpus scrubbing does: a missed odd-format phone
  * number costs less than mangling ordinary prose (and 999.999.999.999
  * redacting as an IP costs nothing).
  *
  * Rules apply in a FIXED sequence (most specific digit shapes first), and
  * each category's count is taken on the text as it stands when that rule
  * runs — so `n_<cat>` equals the number of `<CAT>` placeholders actually
  * inserted, an invariant a post-hoc count on the original text would not
  * satisfy (a card number would also count as two phone-shaped runs).
  *
  * Scale shape: pure per-row codegen'd string expressions
  * (regexp_replace / regexp_count chains) — no shuffle, no UDF, the scan
  * stays inside one WholeStageCodegen span.
  */
object Pii {

  /** `(category, pattern, placeholder)` in APPLICATION ORDER — email
    * first (its local part may contain digit runs), then digit shapes
    * longest-first so a card number is never half-eaten by the phone
    * rule.
    */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b", "<CARD>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** The fully-redacted text: every rule applied in order. */
  def redacted(text: Column): Column =
    Rules.foldLeft(text) { case (t, (_, p, r)) =>
      regexp_replace(t, lit(p), lit(r))
    }

  /** Adds `<outCol>` (redacted text) and one `n_<category>` long per rule
    * — the count of placeholders that rule inserted — plus `n_pii`, their
    * sum. Input column order is preserved. Null text propagates: counts
    * and `<outCol>` stay null (a null document is NOT a clean document,
    * so an `n_pii = 0` release filter never silently admits one); map
    * nulls to empty upstream if that is what they mean.
    */
  def annotate(df: DataFrame, textCol: String,
               outCol: String = "redacted"): DataFrame = {
    val owned = Rules.map(r => s"n_${r._1}") ++ Seq("n_pii", outCol)
    val clash = df.columns.toSet.intersect(owned.toSet)
    require(clash.isEmpty,
      s"annotate owns output columns ${owned.mkString(", ")}; input already " +
        s"has ${clash.mkString(", ")} — rename or pass a different outCol")
    val (cols, redactedCol) =
      Rules.foldLeft((Seq.empty[Column], col(textCol))) {
        case ((acc, t), (cat, p, r)) =>
          (acc :+ regexp_count(t, lit(p)).cast("long").as(s"n_$cat"),
            regexp_replace(t, lit(p), lit(r)))
      }
    df.select(
      df.columns.map(col).toIndexedSeq ++ cols :+
        cols.reduce(_ + _).as("n_pii") :+ redactedCol.as(outCol): _*)
  }

  /** One row per detected instance: `(<idCol>, category, value)`, each
    * value extracted from the text state its rule saw (so an email's
    * digits never double-report as a phone). Rows explode per doc — a
    * clean doc emits nothing. For audits and allowlist review, not the
    * redaction path.
    */
  def findings(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (arrays, _) =
      Rules.foldLeft((Seq.empty[Column], col(textCol))) {
        case ((acc, t), (cat, p, r)) =>
          (acc :+ transform(regexp_extract_all(t, lit(p), lit(0)),
            v => struct(lit(cat).as("category"), v.as("value"))),
            regexp_replace(t, lit(p), lit(r)))
      }
    df.select(col(idCol), explode(concat(arrays: _*)).as("f"))
      .select(col(idCol), col("f.category").as("category"),
        col("f.value").as("value"))
  }
}
