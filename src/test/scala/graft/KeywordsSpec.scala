package graft

import org.apache.spark.sql.functions._

import graft.text.Keywords

/** TextRank over the adjacent-token graph: centrality beats raw
  * frequency, self-loops are dropped, and ranks are exact fixed-point
  * longs (partitioning-independent).
  */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("x198 a bridging hub outranks a term that is merely repeated") {
    // "hub" co-occurs with 6 distinct terms; "spam" occurs more often in
    // total but only ever next to itself (self-loop, dropped) and "filler"
    val docs = Seq(
      (1L, "hub alpha hub beta hub gamma"),
      (2L, "delta hub epsilon hub zeta"),
      (3L, "spam spam spam spam spam spam spam filler"))
      .toDF("doc_id", "text")
    val out = Keywords.textRank(docs, col("doc_id"), col("text"),
      iterations = 5, topK = 3).collect()
    assert(out.head.getAs[String]("term") === "hub")
    // ranks strictly ordered at the cut for this fixture
    val ranks = out.map(_.getAs[Long]("rank_fp")).toSeq
    assert(ranks === ranks.sortBy(-_))
  }

  test("x198 ranks are partitioning-independent exact longs") {
    val docs = Seq(
      (1L, "a b c a b"), (2L, "c d e"), (3L, "b e a d"))
      .toDF("doc_id", "text")
    val one = Keywords.textRank(docs.repartition(1), col("doc_id"),
      col("text"), topK = 10).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val many = Keywords.textRank(docs.repartition(7), col("doc_id"),
      col("text"), topK = 10).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(one === many)
    // total mass conserved up to truncation dust: sum ≈ scale
    val total = one.toSeq.map(_._2).sum
    assert(total > 999990000L && total <= 1000000000L)
  }

  test("x198 single-doc degenerate chain still ranks both endpoints") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val out = Keywords.textRank(docs, col("doc_id"), col("text"), topK = 5)
      .collect()
    assert(out.map(_.getString(0)).toSet === Set("x", "y"))
    // symmetric 2-node graph: equal ranks
    assert(out.map(_.getLong(1)).distinct.length === 1)
  }
}
