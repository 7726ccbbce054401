package graft

import org.apache.spark.sql.functions._

import graft.similarity.SparsePairs

/** Sparse all-pairs TF-IDF cosine with df-capped pairing. */
class SparsePairsSpec extends SparkSpec {
  import spark.implicits._

  test("docs pair only through rare terms; the df cap excludes stop words") {
    // "common" is in every doc (df 4 > maxDf 3) — it must create no pair;
    // "rare" links docs 1 and 2 only
    val docs = Seq(
      (1L, "common rare alpha"),
      (2L, "common rare beta"),
      (3L, "common gamma delta"),
      (4L, "common epsilon zeta")).toDF("doc_id", "text")
    val out = SparsePairs.tfidfPairs(docs, col("doc_id"), col("text"),
        maxDf = 3L, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet === Set((1L, 2L)))
    // each doc's rare subspace: 2 terms of equal weight (same tf, and
    // idf(df=1) for the unique term vs idf(df=2) for "rare") — cosine =
    // w_rare^2 / (sqrt(w_rare^2+w_uniq^2))^2
    val n = 4.0
    val wRare = math.rint((1.0 / 3.0) * math.log(n / 2.0) * 1e4)
    val wUniq = math.rint((1.0 / 3.0) * math.log(n / 1.0) * 1e4)
    val expect = (wRare * wRare) / (wRare * wRare + wUniq * wUniq)
    assert(math.abs(out((1L, 2L)) - expect) < 1e-6)
  }

  test("identical rare-subspace docs score cosine 1.0") {
    val docs = Seq(
      (1L, "x y shared1 shared2"),
      (2L, "x y shared1 shared2"),
      (3L, "x y other1 other2"),
      (4L, "x y other3 other4"),
      (5L, "x y other5 other6")).toDF("doc_id", "text")
    // x/y have df 5 > 4 and drop out; docs 1-2 share an identical rare
    // subspace -> cosine exactly 1
    val out = SparsePairs.tfidfPairs(docs, col("doc_id"), col("text"),
        maxDf = 4L, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(out.toSeq === Seq(((1L, 2L), 1.0)))
  }

  test("pair set is partitioning-independent") {
    val docs = (1L to 60L).map(i =>
      (i, s"filler stuff topic${i % 6} mark${i % 9}")).toDF("doc_id", "text")
    def run(parts: Int) =
      SparsePairs.tfidfPairs(docs.repartition(parts), col("doc_id"),
          col("text"), maxDf = 12L, threshold = 0.1)
        .collect().map(_.toSeq).toSet
    assert(run(1) === run(8))
    assert(run(1).nonEmpty)
  }
}
