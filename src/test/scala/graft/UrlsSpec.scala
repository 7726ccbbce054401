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
}
