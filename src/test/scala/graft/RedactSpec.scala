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

  test("adversarial rows: near-miss email, trailing dot, length boundaries") {
    // the x31 PiiInjections shapes, pinned at the unit level too:
    // 1-char TLD must NOT match; a real email before a trailing dot must
    // stop at the TLD (greedy {2,} cannot eat the final '.')
    val near = scrubOne("ref x@y.z or u7@ex.com. end")
    assert(near.getAs[Int]("n_emails") === 1)
    assert(near.getAs[String]("clean_text") === "ref x@y.z or <EMAIL>. end")
    // mixed-case email with dots/plus local part and subdomains
    val mixed = scrubOne("mail A.B+tag9@Mail.Sub.Example.CO done")
    assert(mixed.getAs[Int]("n_emails") === 1)
    assert(mixed.getAs[String]("clean_text") === "mail <EMAIL> done")
    // phone length boundaries: 9 digits is the pattern's minimum (match),
    // 8 is not; a dashed run at the exact {7,} boundary matches
    val len = scrubOne("tel 111111055 fax 1234-5678 no 12345678x 12 34")
    assert(len.getAs[Int]("n_phones") === 2)
    assert(len.getAs[String]("clean_text") ===
      "tel <PHONE> fax <PHONE> no 12345678x 12 34")
  }
}
