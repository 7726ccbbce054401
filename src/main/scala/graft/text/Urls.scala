package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain operators: extract link targets from document text and
  * aggregate per-domain corpus stats — the substrate for domain-level
  * allow/block lists and per-source mixing decisions, which real corpora
  * apply before any per-document filter.
  *
  * Extraction is a regex in the Java/RE2 agreement subset (like
  * [[Redact]]); stats are one explode + one vocabulary-sized aggregate
  * with map-side partials — no second text pass, no wide shuffle.
  */
object Urls {

  /** Capture group 1 = the authority (domain[:port]) of an http(s) URL. */
  val domainPattern = "https?://([^/ ]+)"

  /** One row per extracted URL: `(doc_id, domain)`. */
  def extractDomains(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
      explode(regexp_extract_all(text, lit(domainPattern), lit(1))).as("domain"))

  /** Per-domain corpus stats: documents touching the domain and total URL
    * occurrences.
    */
  def domainStats(df: DataFrame, id: Column, text: Column): DataFrame =
    extractDomains(df, id, text)
      .groupBy(col("domain"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_urls"))

  /** Corpus minus every doc that links to a blocked domain — the
    * block-list gate. The block list is corpus-tiny: broadcast anti-join.
    */
  def dropBlockedDomains(df: DataFrame, id: Column, text: Column,
      blocked: Seq[String]): DataFrame = {
    val hits = extractDomains(df, id, text)
      .filter(col("domain").isin(blocked: _*))
      .select(col("doc_id").as("__blocked"))
    df.join(broadcast(hits), id === col("__blocked"), "left_anti")
  }
}
