package graft

import org.apache.spark.sql.functions._

import graft.text.Urls

/** URL extraction, domain stats, and the block-list gate. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "intro https://a.example.com/x then http://b.example.net/y end"),
    (2L, "again https://a.example.com/z only"),
    (3L, "no links here")).toDF("doc_id", "text")

  test("extractDomains yields one row per URL with the authority") {
    val out = Urls.extractDomains(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "a.example.com"), (1L, "b.example.net"),
      (2L, "a.example.com")))
  }

  test("domainStats counts docs and occurrences per domain") {
    val out = Urls.domainStats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("a.example.com" -> (2L, 2L), "b.example.net" -> (1L, 1L)))
  }

  test("dropBlockedDomains removes linking docs, keeps the rest") {
    val kept = Urls.dropBlockedDomains(docs, col("doc_id"), col("text"),
        blocked = Seq("b.example.net"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }

  test("dropBlockedDomains: majority-blocked corpus, and no forced broadcast") {
    // one popular blocked domain -> the hit set is a corpus FRACTION; a
    // forced broadcast(hits) would ship most of the corpus's ids to every
    // executor. Correctness on the majority-blocked shape:
    val wide = (1L to 100L).map { i =>
      val d = if (i <= 80) "blocked.example.org" else s"ok$i.example.com"
      (i, s"see https://$d/page$i")
    }.toDF("doc_id", "text")
    val kept = Urls.dropBlockedDomains(wide, col("doc_id"), col("text"),
        blocked = Seq("blocked.example.org"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === (81L to 100L).toSet)
    // and the plan property: the anti-join carries NO broadcast hint —
    // the strategy choice is AQE's (runtime-sized), not hard-coded
    val plan = Urls.dropBlockedDomains(wide, col("doc_id"), col("text"),
      blocked = Seq("blocked.example.org")).queryExecution.analyzed
    val hinted = plan.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.isEmpty, "blocked-domain anti-join must not force broadcast")
  }

  test("canonicalUrl applies each rule; non-targets pass through") {
    val cases = Seq(
      // fragment dropped, authority lowercased, PATH case preserved
      "https://Example.com/A/B#frag" -> "https://example.com/A/B",
      // scheme+www+default port+trailing slash in one URL
      "HTTPS://WWW.Example.com:443/x/" -> "https://example.com/x",
      // non-default port survives (':8080' must not match the ':80' rule)
      "http://site.com:8080/p" -> "http://site.com:8080/p",
      // utm beside a real param (leading), utm-only, and multiple utm
      "https://e.com/p?utm_source=a&id=2" -> "https://e.com/p?id=2",
      "https://e.com/p?utm_a=1&utm_b=2" -> "https://e.com/p",
      "https://e.com/p?id=3&utm_a=1&utm_b=2" -> "https://e.com/p?id=3",
      // not a URL: only the generic rules (here: none) touch it
      "plain text" -> "plain text")
    val got = cases.map(_._1).toDF("url")
      .select(Urls.canonicalUrl(col("url"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("canonicalDedup collapses the variant groups, keeps min id") {
    // two logical URLs, three surface forms + one distinct-query form
    val urls = Seq(
      (10L, "https://E.com/a"), (11L, "https://e.com/a/"),
      (12L, "https://www.e.com/a#x"), (13L, "https://e.com/a?id=1"),
      (20L, "https://e.com/b")).toDF("doc_id", "url")
    val out = Urls.canonicalDedup(urls, col("doc_id"), col("url"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      "https://e.com/a" -> (10L, 3L),
      "https://e.com/a?id=1" -> (13L, 1L),
      "https://e.com/b" -> (20L, 1L)))
  }
}
