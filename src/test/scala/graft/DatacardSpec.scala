package graft

import org.apache.spark.sql.functions._
import graft.text.Datacard

/** Corpus datacard over a hand-built corpus with known duplication. */
class DatacardSpec extends SparkSpec {
  import spark.implicits._

  test("x89 byLang: totals, source counts and exact-dup rate per language") {
    // en: 4 docs, 2 sources, "same text" appears twice → dup rate 0.25;
    // fr: 2 distinct docs → dup rate 0
    val docs = Seq(
      (1L, "en", "s1", "same text", 9L),
      (2L, "en", "s1", "same text", 9L),
      (3L, "en", "s2", "other words here", 16L),
      (4L, "en", "s2", "fourth doc", 10L),
      (5L, "fr", "s1", "bonjour le monde", 16L),
      (6L, "fr", "s3", "autre texte", 11L)
    ).toDF("doc_id", "lang", "source", "text", "n_chars").repartition(3)
    val got = Datacard.byLang(docs, col("lang"), col("source"), col("text"),
        col("n_chars"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // en tokens: 2 + 2 + 3 + 2 = 9; fr tokens: 3 + 2 = 5
    assert(got("en") === ((4L, 2L, 44L, 9L, 2.25, 0.25)))
    assert(got("fr") === ((2L, 2L, 27L, 5L, 2.5, 0.0)))
  }

  test("x90 tokenizerFertility: subword model ratios per language") {
    val docs = Seq(
      // en: "aaaa bb" → 2 words, 1+1 subwords; "abcdefgh x" → 2 words, 2+1
      (1L, "en", "aaaa bb", 7L),
      (2L, "en", "abcdefgh x", 10L),
      // zh: one 9-char word → ceil(9/4)=3 subwords
      (3L, "zh", "abcdefghi", 9L)
    ).toDF("doc_id", "lang", "text", "n_chars").repartition(2)
    val got = Datacard.tokenizerFertility(docs, col("lang"), col("text"),
        col("n_chars"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("en") === ((2L, 4L, 5L, 1.25, 3.4)))
    assert(got("zh") === ((1L, 1L, 3L, 3.0, 3.0)))
  }

  test("x89 byLang: byte-identical texts in different languages don't cross-collapse") {
    val docs = Seq(
      (1L, "en", "s1", "hello", 5L),
      (2L, "de", "s1", "hello", 5L)
    ).toDF("doc_id", "lang", "source", "text", "n_chars")
    val got = Datacard.byLang(docs, col("lang"), col("source"), col("text"),
        col("n_chars"))
      .collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(got === Map("en" -> 0.0, "de" -> 0.0))
  }
}
