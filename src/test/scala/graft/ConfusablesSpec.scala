package graft

import org.apache.spark.sql.functions._

import graft.text.Confusables

/** x208 homoglyph-spoof detection. */
class ConfusablesSpec extends SparkSpec {
  import spark.implicits._

  test("skeleton folds case and Cyrillic confusables to one key") {
    val rows = Seq(
      ("free money now", "free money now"),
      // Cyrillic е/о substituted into the same phrase
      ("frее mоnеy now", "free money now"),
      ("FREE Money NOW", "free money now"),
      ("other text", "other text")
    ).toDF("t", "want")
    val got = rows.select(Confusables.skeleton(col("t")).as("sk"),
      col("want")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("x208 spoofGroups pairs a spoof with its original, counts mixed " +
      "members, and drops raw duplicates and singletons") {
    val docs = Seq(
      (1L, "win a prize today"),
      // homoglyph spoof of doc 1 (Cyrillic а, mixed-script)
      (2L, "win а prize todаy"),
      // case-only variant of doc 1: same skeleton, NOT mixed-script
      (3L, "WIN a Prize Today"),
      (4L, "unrelated document"),
      (5L, "unrelated document"), // raw duplicate: 1 variant, excluded
      (6L, "lone text")
    ).toDF("doc_id", "text")
    val got = Confusables.spoofGroups(docs, col("doc_id"), col("text"))
      .collect()
    assert(got.length === 1)
    val g = got.head
    assert(g.getAs[Long]("min_doc") === 1L)
    assert(g.getAs[Long]("max_doc") === 3L)
    assert(g.getAs[Long]("n_docs") === 3L)
    assert(g.getAs[Long]("n_variants") === 3L)
    assert(g.getAs[Long]("n_mixed") === 1L) // only doc 2 mixes scripts
    assert(g.getAs[Int]("skeleton_len") === "win a prize today".length)
  }
}
