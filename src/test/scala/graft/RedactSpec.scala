package graft

import org.apache.spark.sql.functions._

import graft.text.Redact

/** PII scrub on crafted strings: replacement, counts, ordering. */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String) =
    Redact.scrub(Seq((1L, text)).toDF("doc_id", "text"),
      col("doc_id"), col("text")).head()

  test("emails and phones are replaced and counted") {
    val r = scrubOne(
      "write to alice.smith+x@corp.example.org or bob@ex.io, call +1 555 123 4567")
    assert(r.getAs[String]("clean_text") ===
      "write to <EMAIL> or <EMAIL>, call <PHONE>")
    assert(r.getAs[Int]("n_emails") === 2)
    assert(r.getAs[Int]("n_phones") === 1)
  }

  test("clean text passes through untouched with zero counts") {
    val r = scrubOne("no contact information in this sentence")
    assert(r.getAs[String]("clean_text") ===
      "no contact information in this sentence")
    assert(r.getAs[Int]("n_emails") === 0 && r.getAs[Int]("n_phones") === 0)
  }

  test("digits inside an email are not double-counted as a phone") {
    // the email is scrubbed first, so its digit run never reaches the
    // phone pattern
    val r = scrubOne("ping user12345678901@host.example please")
    assert(r.getAs[Int]("n_emails") === 1)
    assert(r.getAs[Int]("n_phones") === 0)
    assert(r.getAs[String]("clean_text") === "ping <EMAIL> please")
  }

  test("multiple phone formats match the bounded pattern") {
    val r = scrubOne("a 555-123-4567 b 02 1234 5678 c 12345 d")
    assert(r.getAs[Int]("n_phones") === 2) // the bare 5-digit run is too short
    assert(r.getAs[String]("clean_text") === "a <PHONE> b <PHONE> c 12345 d")
  }
}
