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

  /** Crawl-grade URL canonicalization — the normalization a crawl dedup
    * applies BEFORE any content pass, because the same page is fetched
    * under dozens of surface forms and canonical-URL collapse is free
    * compared to shingling. Rules, in order (each a pure column op, so the
    * whole chain is one codegen'd projection — map-only at any scale):
    *
    *  1. drop the fragment (`#…` — client-side only);
    *  2. lowercase the scheme+authority (case-insensitive by RFC 3986;
    *     the path stays case-sensitive);
    *  3. drop a leading `www.`;
    *  4. drop explicit default ports `:80`/`:443`;
    *  5. drop `utm_*` tracking parameters (with `?`/`&` repair);
    *  6. drop trailing slashes.
    *
    * The regexes stay in the Java/RE2 agreement subset (no lookaround —
    * RE2 has none), so the DuckDB oracle can mirror the chain rule for
    * rule; the two dialects differ only in replacement syntax ($1 vs \1)
    * and DuckDB's explicit 'g' flag.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val head = lower(regexp_extract(noFrag, "^(?i)(https?://[^/?#]*)", 1))
    val tail = noFrag.substr(length(head) + 1, length(noFrag))
    val lowered = concat(head, tail)
    val noWww = regexp_replace(lowered, "^(https?)://www\\.", "$1://")
    // two anchor-free port rules instead of one lookahead: ':80|:443' at
    // end-of-string, or followed by a delimiter (':8080' never matches —
    // the char after ':80' is '8', not a delimiter)
    val noPort = regexp_replace(
      regexp_replace(noWww, ":(?:80|443)$", ""),
      ":(?:80|443)([/?#])", "$1")
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noPort, "&utm_[^&#]*", ""),
        "\\?utm_[^&#]*&", "?"),
      "\\?utm_[^&#]*$", "")
    regexp_replace(noUtm, "/+$", "")
  }

  /** Canonical-URL dedup: collapse a `(doc_id, url)` frame to one row per
    * canonical form, keeping the minimum doc id and the variant count —
    * the first, cheapest dedup tier of a crawl pipeline (no text ever
    * read). One hash aggregate on the canonical string; map-side partials
    * make the shuffle |canonical|-sized.
    */
  def canonicalDedup(df: DataFrame, id: Column, url: Column): DataFrame =
    df.select(canonicalUrl(url).as("canonical_url"), id.as("__id"))
      .groupBy(col("canonical_url"))
      .agg(min(col("__id")).as("canonical_doc"),
        count(lit(1)).as("n_variants"))

  /** Corpus minus every doc that links to a blocked domain — the
    * block-list gate. The BLOCK LIST is corpus-tiny but the HIT SET is
    * not bounded by it: one popular blocked domain makes `hits` a corpus
    * fraction, so a forced `broadcast(hits)` is a driver/executor OOM at
    * 100 TB. No hint — AQE broadcasts when the runtime size is small and
    * falls back to a shuffled anti-join when it isn't (the same
    * discipline as the C4-boilerplate anti-join).
    */
  def dropBlockedDomains(df: DataFrame, id: Column, text: Column,
      blocked: Seq[String]): DataFrame = {
    val hits = extractDomains(df, id, text)
      .filter(col("domain").isin(blocked: _*))
      .select(col("doc_id").as("__blocked"))
    df.join(hits, id === col("__blocked"), "left_anti")
  }
}
