package graft

import org.apache.spark.sql.functions._

import graft.text.QualityRules
import graft.text.QualityRules.Thresholds

/** Per-rule verdicts on crafted documents — covers the rules the synthetic
  * corpus never trips (bullet lines, ellipsis lines, symbol-only words).
  */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val t = Thresholds(minWords = 3, maxWords = 10)

  private def reportFor(text: String) =
    QualityRules.report(Seq((1L, text)).toDF("doc_id", "text"),
      col("doc_id"), col("text"), t).head()

  test("clean prose passes every rule") {
    val r = reportFor("the quick brown fox is running in a field")
    assert(r.getAs[Boolean]("passes_all"))
  }

  test("word-count bounds reject short and long docs") {
    assert(!reportFor("too short").getAs[Boolean]("ok_word_count"))
    assert(!reportFor(("word " * 20).trim).getAs[Boolean]("ok_word_count"))
  }

  test("symbol-salad fails the alpha-word ratio, numerals count as non-alpha") {
    val r = reportFor("the 1 2 3 4 5 $$ %% of !!")
    assert(!r.getAs[Boolean]("ok_alpha_words"))
    assert(!r.getAs[Boolean]("passes_all"))
  }

  test("bullet-list and ellipsis-heavy docs fail the line rules") {
    val bullets = (1 to 10).map(i => s"- the item number $i is here").mkString("\n")
    val rb = QualityRules.report(Seq((1L, bullets)).toDF("doc_id", "text"),
      col("doc_id"), col("text"),
      Thresholds(minWords = 3, maxWords = 1000, maxBulletLineRatio = 0.5)).head()
    assert(!rb.getAs[Boolean]("ok_lines"))
    val dots = "the first line is...\nthe second line is...\nplain third line of text"
    val rd = QualityRules.report(Seq((1L, dots)).toDF("doc_id", "text"),
      col("doc_id"), col("text"),
      Thresholds(minWords = 3, maxWords = 1000, maxEllipsisLineRatio = 0.3)).head()
    assert(!rd.getAs[Boolean]("ok_lines"))
  }

  test("stopword floor rejects stopword-free keyword stuffing") {
    val r = reportFor("buy cheap widgets best widgets cheap deals widgets")
    assert(!r.getAs[Boolean]("ok_stopwords"))
  }

  test("filterPassing keeps exactly the passing docs") {
    val docs = Seq(
      (1L, "the quick brown fox is running in a field"),
      (2L, "too short")).toDF("doc_id", "text")
    val kept = QualityRules.filterPassing(docs, col("doc_id"), col("text"), t)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("x97 langConfusion: cells and per-actual recall on marker-laden docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat is of the house"),   // en → en
      (2L, "en", "el gato que la los una"),    // mislabeled: en → es
      (3L, "de", "der hund und die katze"),    // de → de
      (4L, "fr", "le chien et les chats une")) // fr → fr
      .toDF("doc_id", "lang", "text").repartition(2)
    val got = graft.text.TextAnalysis.langConfusion(docs, col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("en", "en") -> ((1L, 0.5)), ("en", "es") -> ((1L, 0.5)),
      ("de", "de") -> ((1L, 1.0)), ("fr", "fr") -> ((1L, 1.0))))
  }

  test("x165 langIdMargin: decisive docs keep, photo-finish docs abstain") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat is of the and a house"),  // en hits 6, others 0: margin 6
      (2L, "the la cat"),                     // en 1, es 1, fr 1 → margin 0
      (3L, "der und the is")                  // de 2, en 2 → tie, margin 0
    ).toDF("doc_id", "text").repartition(2)
    val got = graft.text.TextAnalysis.langIdMargin(docs, col("text"),
        minMargin = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // doc2 argmax ties break on lang order (de < en … ): es? en? — en and
    // es and fr all score 1; first-listed wins, so detected = de? No: de
    // scores 0; among {en, es, fr} at 1, the fold keeps the EARLIEST
    // (en). doc3 ties de/en at 2 → de (listed first).
    assert(got("en") === ((2L, 1L, 3.0, 0.5)))
    assert(got("de") === ((1L, 1L, 0.0, 1.0)))
  }
}
