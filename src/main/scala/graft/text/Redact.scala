package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction: scrub emails and phone numbers from a text column and
  * report per-document match counts — the pass every training corpus runs
  * before anything else sees the data. Pure projection (regexp_replace +
  * regexp_extract_all): no UDF, no shuffle, one codegen'd scan at any
  * corpus size.
  *
  * Patterns deliberately stay in the regex subset where Java's engine
  * (Spark) and RE2 (DuckDB oracle) agree — character classes, bounded
  * repetition, alternation; no backreferences or lookaround — so the scrub
  * is engine-checkable. Real deployments extend the pattern list; the
  * plumbing (ordered multi-pattern replace + counts) is the operator.
  */
object Redact {

  /** Ordered (name, pattern, replacement): applied top to bottom, so
    * earlier scrubs can't create later matches and counts are unambiguous.
    */
  val defaultPatterns: Seq[(String, String, String)] = Seq(
    ("emails", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phones", "\\+?\\d[\\d -]{7,}\\d", "<PHONE>"))

  /** `(doc_id, clean_text, n_<pattern>...)`: text with every pattern
    * replaced, plus one match-count column per pattern (counted BEFORE any
    * replacement of that pattern, after all earlier ones).
    */
  def scrub(df: DataFrame, id: Column, text: Column,
      patterns: Seq[(String, String, String)] = defaultPatterns): DataFrame = {
    require(patterns.nonEmpty, "at least one pattern is required")
    val (cleaned, counts) = patterns.foldLeft((text, Seq.empty[Column])) {
      case ((t, cs), (name, pat, rep)) =>
        (regexp_replace(t, pat, rep),
          cs :+ size(regexp_extract_all(t, lit(pat), lit(0))).as(s"n_$name"))
    }
    df.select((id.as("doc_id") +: cleaned.as("clean_text") +: counts): _*)
  }
}
