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

  test("x193 compressionPlan: hand-computed varint bytes per df band") {
    import spark.implicits._
    // spark: ids 3,7,10,300 -> deltas 3,4,3,290 -> bitlens 2,3,2,9 ->
    //   varint bytes 1,1,1,2 = 5; df 4 -> band bitlen(4) = 3
    // streams: 7,10 -> 7,3 -> 1+1 = 2; joins: 3,20 -> 3,17 -> 1+1 = 2;
    //   both df 2 -> band 2
    // zero: id 0 -> delta 0 -> bin(0) = "0", 1 byte; df 1 -> band 1
    val d = (docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq ++ Seq((300L, "spark"), (0L, "zero"))).toDF("doc_id", "text")
    val got = Postings.compressionPlan(d, col("doc_id"), col("text"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got(3) === ((1L, 4L, 32L, 5L, math.rint(5.0 / 32.0 * 1e6) / 1e6)))
    assert(got(2) === ((2L, 4L, 32L, 4L, 0.125)))
    assert(got(1) === ((1L, 1L, 8L, 1L, 0.125)))
  }

  test("x193 compressionPlan: a 7-bit gap costs 1 byte, an 8-bit gap 2") {
    import spark.implicits._
    // gaps 127 (7 bits) and 128 (8 bits) straddle the varint boundary
    val d = Seq((1L, "t"), (128L, "t"), (256L, "t")).toDF("doc_id", "text")
    val got = Postings.compressionPlan(d, col("doc_id"), col("text"))
      .head()
    // deltas: 1 (1 byte), 127 (1 byte), 128 (2 bytes)
    assert(got.getAs[Long]("varint_bytes") === 4L)
  }
}
