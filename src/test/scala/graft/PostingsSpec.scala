package graft

import org.apache.spark.sql.functions._

import graft.text.Postings

/** Delta-encoded posting lists through the bounded-heap aggregate. */
class PostingsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (10L, "spark spark streams"),
    (3L, "spark joins"),
    (7L, "spark streams"),
    (20L, "joins")).toDF("doc_id", "text")

  private def rows(maxPostings: Int, minDf: Long) =
    Postings.postingLists(docs, col("doc_id"), col("text"), maxPostings, minDf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))

  test("deltas reconstruct the ascending doc-id list") {
    val byTerm = rows(maxPostings = 8, minDf = 1).groupBy(_._1)
    val spark_ = byTerm("spark").sortBy(_._4).map(_._5)
    // docs 3, 7, 10 -> absolute 3, gaps 4, 3
    assert(spark_.toSeq === Seq(3L, 4L, 3L))
    val joins = byTerm("joins").sortBy(_._4).map(_._5)
    assert(joins.toSeq === Seq(3L, 17L))
  }

  test("doc_freq and term_freq are full-corpus counts even when truncated") {
    val byTerm = rows(maxPostings = 2, minDf = 1).groupBy(_._1)
    val sp = byTerm("spark")
    // postings truncate to the first 2 ids (3 then gap 4)...
    assert(sp.sortBy(_._4).map(_._5).toSeq === Seq(3L, 4L))
    // ...but frequencies still count all 3 docs / 4 occurrences
    assert(sp.head._2 === 3L)
    assert(sp.head._3 === 4L)
  }

  test("minDf gates the vocabulary") {
    val terms = rows(maxPostings = 8, minDf = 3).map(_._1).toSet
    assert(terms === Set("spark"))
  }

  test("posting prefix is partitioning-independent") {
    val a = Postings.postingLists(docs.repartition(1), col("doc_id"),
      col("text"), 2, 1).collect().map(_.toSeq).toSet
    val b = Postings.postingLists(docs.repartition(7), col("doc_id"),
      col("text"), 2, 1).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
