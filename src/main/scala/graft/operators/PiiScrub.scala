package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the compliance pass a training-data
  * pipeline runs before anything ships: emails, phone numbers, IPv4
  * addresses, and SSN-shaped ids are replaced with typed placeholder
  * tokens, and per-document hit counts feed the audit rollup (q102).
  *
  * Patterns are written in the Java-regex ∩ RE2 common subset (no
  * backrefs, no lookaround) so Spark `regexp_replace`/`regexp_extract_all`
  * and the DuckDB oracle agree match-for-match. Order matters and is
  * fixed: SSN before phone (both are digit-dash shapes), IP before phone
  * (dotted digits), so each span is claimed by exactly one category.
  *
  * Scale shape: pure per-row map — no shuffle, no UDF; regexes stay in
  * whole-stage codegen via the built-in string expressions.
  */
object PiiScrub {

  /** (category, pattern, replacement) in claim order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"))

  /** The redacted text: patterns applied in claim order. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (t, (_, pat, repl)) =>
      regexp_replace(t, pat, repl)
    }

  /** Per-doc hit counts (one `n_<category>` column each) plus the char
    * count removed by redaction — counts run on the PRE-redaction text
    * with the same claim order, by counting on the text with earlier
    * categories already redacted (so an IP inside an email, etc., is
    * never double-counted).
    */
  def withPiiColumns(df: DataFrame, textCol: String): DataFrame = {
    val (out, _) = Patterns.foldLeft((df, col(textCol))) {
      case ((acc, t), (cat, pat, repl)) =>
        val counted = acc.withColumn(
          s"n_$cat",
          size(regexp_extract_all(t, lit(pat), lit(0))).cast("long"))
        (counted, regexp_replace(t, pat, repl))
    }
    out.withColumn("n_pii",
      Patterns.map { case (cat, _, _) => col(s"n_$cat") }.reduce(_ + _))
  }
}
