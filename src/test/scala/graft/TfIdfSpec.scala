package graft

import org.apache.spark.sql.functions._

import graft.text.TfIdf

/** TF-IDF and vocabulary stats on a corpus small enough to check by hand. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // "apple" is unique to doc 1, "banana" to doc 2, "the" is everywhere
  private val docs = Seq(
    (1L, "the apple the apple the"),
    (2L, "the banana the"),
    (3L, "the cherry date")).toDF("doc_id", "text")

  test("tfidfTopK ranks document-specific terms above ubiquitous ones") {
    val top = TfIdf.tfidfTopK(docs, col("doc_id"), col("text"), k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    assert(top === Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // "the" occurs in every doc: idf = ln(1) = 0, so its tfidf is exactly 0
    val theRows = TfIdf.tfidfTopK(docs, col("doc_id"), col("text"), k = 10)
      .filter(col("term") === "the").select("tfidf").as[Double].collect()
    assert(theRows.nonEmpty && theRows.forall(_ === 0.0))
    // ties at equal tfidf break by term order: doc 3 has cherry/date both 1x
    val d3 = TfIdf.tfidfTopK(docs, col("doc_id"), col("text"), k = 10)
      .filter(col("doc_id") === 3L).orderBy(col("rank"))
      .select("term").as[String].collect().toSeq
    assert(d3 === Seq("cherry", "date", "the"))
  }

  test("tfidf value matches the closed form") {
    val r = TfIdf.tfidfTopK(docs, col("doc_id"), col("text"), k = 1)
      .filter(col("doc_id") === 2L).head()
    // tf = 1/3, idf = ln(3/1)
    val expected = math.rint((1.0 / 3.0) * math.log(3.0) * 1e6) / 1e6
    assert(r.getAs[Double]("tfidf") === expected)
  }

  test("vocabStats counts occurrences and doc frequency, top-k ordered") {
    val v = TfIdf.vocabStats(docs, col("doc_id"), col("text"), topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(v === Seq(("the", 6L, 3L), ("apple", 2L, 1L)))
  }

  test("unigramSurprise scores rare-token docs above common-token docs") {
    val corpus = Seq(
      (1L, "common common common common"),
      (2L, "common common common rareword")).toDF("doc_id", "text")
    val out = TfIdf.unigramSurprise(corpus, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) > out(1L))
    // doc 1 is all "common" (7 of 8 corpus tokens): surprise = -ln(7/8)
    val expected = math.rint(-math.log(7.0 / 8.0) * 1e6) / 1e6
    assert(out(1L) === expected)
  }

  test("vocabStats plans TakeOrderedAndProject, not a global sort") {
    val plan = TfIdf.vocabStats(docs, col("doc_id"), col("text"), topK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
